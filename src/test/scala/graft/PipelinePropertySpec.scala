package graft

import graft.operators.{Dedup, Events, Pipeline, Sketch}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style equivalence tests for the round-2 operators,
  * checked against naive reference computations on seeded random
  * corpora (deterministic seeds — no flaky generators). */
class PipelinePropertySpec extends SparkSpec {

  /** Seeded random corpus with a tiny vocabulary, so shingle
    * collisions and high-jaccard pairs actually occur. */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 12).map(i => s"w$i")
    (0 until nDocs).map { i =>
      val words = (0 until 12 + rnd.nextInt(8))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
  }

  test("prefix-filtered jaccard equals the naive all-pairs reference") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed, 60)
      val got = Dedup.ngramJaccardOf(docs.toDF("doc_id", "text"), 0.5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // naive reference: exact all-pairs over distinct 3-gram sets
      def sh(t: String): Set[String] = {
        val w = t.split(" ", -1)
        (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      }
      val sets = docs.map { case (id, t) => id -> sh(t) }.toMap
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (sets(a) intersect sets(b)).size
        if inter > 0
        j = inter.toDouble / (sets(a).size + sets(b).size - inter)
        if j >= 0.5
      } yield (a, b) -> j).toMap
      assert(got == want, s"seed $seed: got ${got.size} want ${want.size}")
    }
  }

  test("count-min estimate upper-bounds the true count, always") {
    val rows = Sketch.countMinAudit(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS under-estimated ${r.getString(0)}: est=${r.getLong(2)} n=${r.getLong(1)}"))
  }

  test("session assignment is consistent with the session counter (q14)") {
    // the highest session ordinal equals the session count, per user
    val bad = Events.sessionAssign(spark, sfDir)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("max_sid"))
      .join(Events.sessionize(spark, sfDir), "user_id")
      .filter(col("max_sid") =!= col("n_sessions"))
      .count()
    assert(bad == 0)
  }

  test("pointer-doubling components equal min-label propagation") {
    import spark.implicits._
    for (seed <- Seq(7, 8)) {
      val rnd = new Random(seed)
      // a long path graph (the pointer-doubling target: diameter 40,
      // where plain propagation needs 40 rounds) plus random edges
      val chain = (0L until 40L).map(i => (i * 3, i * 3 + 3))
      val rand = Seq.fill(60)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter(p => p._1 != p._2)
      val edges = (chain ++ rand).toDF("d1", "d2")
      val plain = Dedup.components(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val doubled = Dedup.components(edges, pointerDoubling = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(plain == doubled, s"seed $seed: pointer doubling diverged")
    }
  }

  test("token packing: chunks respect the budget and are contiguous per shard") {
    val budget = 512L
    for (shards <- Seq(1, 8)) {
      val packed = Pipeline.tokenPack(spark, sfDir, budget, shards).collect()
      def lang(r: org.apache.spark.sql.Row) = r.getAs[String]("lang")
      def shard(r: org.apache.spark.sql.Row) = r.getAs[Long]("shard")
      def chunk(r: org.apache.spark.sql.Row) = r.getAs[Long]("chunk_id")
      def nTok(r: org.apache.spark.sql.Row) = r.getAs[Long]("n_tokens")
      def doc(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id")
      assert(packed.map(shard).toSet.subsetOf((0L until shards).toSet))
      packed.groupBy(r => (lang(r), shard(r), chunk(r))).foreach {
        case ((_, _, c), rows) =>
          val total = rows.map(nTok).sum
          // greedy running-sum packing: a chunk only exceeds the
          // budget by (at most) its final straddling document
          assert(total - rows.map(nTok).max <= budget,
            s"shards=$shards chunk $c over budget: $total")
      }
      // contiguity: within (lang, shard), chunk ids are monotone in doc_id
      packed.groupBy(r => (lang(r), shard(r))).foreach { case (_, rows) =>
        val chunkSeq = rows.sortBy(doc).map(chunk)
        assert(chunkSeq.zip(chunkSeq.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("winnowing guarantee: any shared run of ≥ w+2 tokens is detected") {
    // the MOSS property q101 relies on: a shared contiguous run of
    // w+2 tokens contains a full w-window of shared trigrams in BOTH
    // docs, whose min hash is selected as a fingerprint by both —
    // so the pair MUST surface (with the cap and minShared relaxed)
    import spark.implicits._
    val rnd = new Random(11)
    val vocab = (0 until 40).map(i => s"v$i")
    def words(n: Int): Seq[String] =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val run = Seq("r0", "r1", "r2", "r3", "r4", "r5") // 6 = w+2 tokens
    val docs = (0 until 20).map { i =>
      val filler = words(15 + rnd.nextInt(10))
      // even docs embed the run at a random offset; odd docs don't
      val text =
        if (i % 2 == 0) {
          val at = rnd.nextInt(filler.size)
          (filler.take(at) ++ run ++ filler.drop(at)).mkString(" ")
        } else filler.mkString(" ")
      (i.toLong, text)
    }
    val found = Dedup.winnowPairsOf(docs.toDF("doc_id", "text"),
        w = 4, minShared = 1, postingCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val embedders = docs.map(_._1).filter(_ % 2 == 0)
    for (a <- embedders; b <- embedders if a < b)
      assert(found.contains((a, b)),
        s"pair ($a,$b) shares a ${run.size}-token run but was not detected")
  }

  test("boilerplate report: capped-out fingerprints are reported, not lost") {
    // drop-vs-report exhaustiveness (q101 + q110 at the same cap):
    // every fingerprint is either eligible for pairing (df ≤ cap)
    // or in the report (df > cap) — a passage hot enough to be
    // dropped from pairing MUST surface in the report
    import spark.implicits._
    val rnd = new Random(23)
    val vocab = (0 until 40).map(i => s"v$i")
    def words(n: Int): Seq[String] =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val header = Seq("h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
    val docs = (0 until 30).map { i =>
      ((i.toLong, (header ++ words(15 + rnd.nextInt(10))).mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text")
    val cap = 10
    val report = Dedup.winnowBoilerplateOf(df, w = 4, postingCap = cap)
      .collect()
    // the shared 8-token header guarantees ≥1 fingerprint in all 30
    // docs — far above the cap, so the report cannot be empty
    assert(report.nonEmpty, "30-doc shared header missing from report")
    assert(report.forall(_.getLong(1) > cap))
    val reported = report.map(_.getLong(0)).toSet
    // exhaustiveness: reported ∪ pairing-eligible = all fingerprints
    val byFp = Dedup.winnowFingerprints(df, 4)
      .groupBy("fp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byFp.foreach { case (fp, dfreq) =>
      assert(reported.contains(fp) == (dfreq > cap),
        s"fp $fp df=$dfreq split disagrees with report membership")
    }
  }
}
