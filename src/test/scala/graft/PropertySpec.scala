package graft

import graft.functions.{Scored, TopKAgg}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom native code paths (no SparkSession —
  * pure expression/aggregator logic against reference implementations;
  * raw ScalaCheck Gen sampling, no scalatestplus bridge needed). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("WordShingles3 equals the naive reference implementation") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "ff", "g")
    samples(Gen.listOfN(12, word), 200).foreach { words =>
      val text = words.mkString(" ")
      val got = org.apache.spark.sql.graft.WordShingles3
        .shingles3(UTF8String.fromString(text))
      val gotSet = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toSet
      val toks = text.split(" ", -1)
      val want = (0 to toks.length - 3)
        .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
      assert(gotSet == want)
      assert(got.numElements() == want.size) // distinct
    }
  }

  test("MinHashMd5 signature equals per-hash md5 minimum") {
    val shingleGen = Gen.listOfN(6, Gen.alphaNumStr.suchThat(_.nonEmpty))
    samples(shingleGen, 50).foreach { shingles =>
      val arr = new GenericArrayData(
        shingles.map(s => UTF8String.fromString(s): Any).toArray)
      val sig = org.apache.spark.sql.graft.MinHashMd5.signature(arr, 4)
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String = {
        md.reset()
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      (0 until 4).foreach { i =>
        val want = shingles.map(s => md5hex(s"$i|$s")).min
        assert(sig.getUTF8String(i).toString == want)
      }
    }
  }

  test("TopKAgg matches global sort regardless of chunking") {
    val items = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(-5.0, 5.0)))
    samples(Gen.zip(items, Gen.choose(1, 5)), 200).foreach { case (xs, nChunks) =>
      val scored = xs.map { case (id, sc) => Scored(id, sc) }
      val agg = new TopKAgg(3)
      val chunks = if (scored.isEmpty) Seq(Seq.empty)
        else scored.grouped(math.max(1, scored.length / nChunks)).toSeq
      val merged = chunks
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
        .reduceOption(agg.merge).getOrElse(agg.zero)
      val want = scored
        .sortWith((a, b) => a.score > b.score || (a.score == b.score && a.id < b.id))
        .take(3)
      assert(agg.finish(merged) == want)
    }
  }

  test("LongArrayDot never differs from BigInt reference") {
    val vec = Gen.listOfN(16, Gen.choose(-1000000L, 1000000L))
    samples(Gen.zip(vec, vec), 200).foreach { case (a, b) =>
      val ad = new GenericArrayData(a.map(x => x: Any).toArray)
      val bd = new GenericArrayData(b.map(x => x: Any).toArray)
      val expr = org.apache.spark.sql.graft.LongArrayDot(
        org.apache.spark.sql.catalyst.expressions.Literal(ad,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal(bd,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      val got = expr.eval(null).asInstanceOf[Long]
      val want = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(got) == want)
    }
  }
}
