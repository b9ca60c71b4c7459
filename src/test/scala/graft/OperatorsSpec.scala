package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Sanity specs for operators whose full results are oracle-checked by
  * the driver (tools/check.py); rows-only operators get real
  * assertions here. */
class OperatorsSpec extends SparkSpec {

  test("latestByKey generic compaction matches window formulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
    val got = Events.latestByKey(ev, "user_id",
      Seq("ts", "event_id"), Seq("event_id", "ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val want = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"))
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("simhash: near-identical docs land within small hamming distance") {
    def collectSig() = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> java.lang.Long.parseUnsignedLong(r.getString(1), 16)).toMap
    val sh = collectSig()
    // 16 lowercase hex chars per signature
    Dedup.simhash(spark, sfDir).collect().foreach { r =>
      assert(r.getString(1).matches("[0-9a-f]{16}"), s"bad signature ${r.getString(1)}")
    }
    // exact near-dup pair from jaccard query at this sf (if any): use
    // the top jaccard pairs to sanity-check hamming locality
    val pairs = Dedup.ngramJaccard(spark, sfDir).collect()
    if (pairs.nonEmpty) {
      val close = pairs.map { r =>
        val (d1, d2) = (r.getLong(0), r.getLong(1))
        java.lang.Long.bitCount(sh(d1) ^ sh(d2))
      }
      assert(close.min <= 12, s"near-dup pairs should have small hamming: ${close.min}")
    }
    // determinism
    assert(sh == collectSig())
  }

  test("ann lsh buckets: deterministic and similar vectors co-bucket above chance") {
    val b1 = Similarity.annLshBuckets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.annLshBuckets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    // 8 sign bits → buckets in [0, 256); sizes consistent with counts
    assert(b1.values.forall(b => b >= 0 && b < 256))
    val rows = Similarity.annLshBuckets(spark, sfDir).collect()
    val counts = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getLong(2) == counts(r.getLong(1))))
    // q24's banded near-dup pairs collide in >=1 two-bit band by
    // construction — verify against an independent recomputation of
    // the plane bits (the md5 parity family)
    val nd = Similarity.embedNearDup(spark, sfDir).collect()
    if (nd.nonEmpty) {
      val vecs = Similarity.quantized(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      def bits(v: Array[Long], p: Int): Long = {
        val pl = Similarity.plane(p, v.length)
        if (v.indices.map(i => v(i) * pl(i)).sum > 0) 1L else 0L
      }
      nd.foreach { r =>
        val (v1, v2) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
        val shares = (0 until 8).exists { b =>
          bits(v1, 2 * b) == bits(v2, 2 * b) && bits(v1, 2 * b + 1) == bits(v2, 2 * b + 1)
        }
        assert(shares, s"pair ${r.getLong(0)}-${r.getLong(1)} shares no band")
      }
    }
  }

  test("ivf ann: probed search returns valid, deterministic top-k") {
    // NOTE: the synthetic embeddings are isotropic noise (intra-label
    // cosine == inter-label cosine ~= 0), so no coarse quantizer can
    // beat random probing here; recall ~= nprobe/k by construction.
    // Assert the IVF mechanics, not cluster luck.
    val ivf = Similarity.ivfTopK(spark, sfDir).collect()
    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)))
      // ranks ordered by cosine desc
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // IVF cosine can never exceed the brute-force best
    val bfBest = Similarity.annBruteForce(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ivf.foreach(r => assert(r.getDouble(3) <= bfBest(r.getLong(0)) + 1e-12))
    val again = Similarity.ivfTopK(spark, sfDir).collect()
    assert(ivf.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("jaccard prefix index: posting cap is a no-op on real data at t=0.5") {
    def pairs(cap: Int) = Dedup.ngramJaccard(spark, sfDir, postingCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(Int.MaxValue) == pairs(64))
  }

  test("jaccard prefix index: boilerplate skew stays bounded and lossless") {
    // every doc shares a hot 12-token boilerplate header (posting
    // lists of size N for its shingles under a naive inverted index);
    // prefix filtering must still find exactly the true near-dup pair
    // without indexing the hot shingles
    import spark.implicits._
    val boiler = "breaking news update for subscribers of the daily channel feed"
    val uniq = (0 until 40).map(i =>
      (i.toLong, s"$boiler unique body $i with words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    // docs 100/101: near-identical bodies (one token differs)
    val nearDup = Seq(
      (100L, s"$boiler shared body alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, s"$boiler shared body alpha beta gamma delta epsilon zeta eta theta iota kappb"))
    val docs = (uniq ++ nearDup).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardOf(docs, 0.5, postingCap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)), s"got $got")
    // and the capped run equals the uncapped run on the skewed corpus
    val uncapped = Dedup.ngramJaccardOf(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == got)
  }

  test("multimodal decode stub: map-partitions path matches declarative path") {
    val a = Multimodal.binaryMeta(spark, sfDir).select("doc_id", "byte_len", "content_sha")
    val b = Multimodal.decodePartitions(spark, sfDir).toDF()
      .select("doc_id", "byte_len", "content_sha")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("dp noisy counts: Laplace mechanism is consistent, 1/eps-scaled, deterministic") {
    def rows(eps: Double) = Privacy.dpNoisyCounts(spark, sfDir, epsilon = eps)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val e05 = rows(0.5)
    // noisy = true + noise (post-processing consistency, up to rounding)
    e05.values.foreach { case (n, noisy, noise) =>
      assert(math.abs(noisy - (n + noise)) < 1e-9, s"$n $noisy $noise") }
    // true counts preserved for the audit column
    assert(e05.values.map(_._1).sum == Tables.customer(spark, sfDir).count())
    // Laplace scale is 1/eps: same seeded uniform, so doubling eps
    // exactly halves each noise draw (up to the 4-decimal rounding)
    val e10 = rows(1.0)
    e05.foreach { case (seg, (_, _, nz05)) =>
      assert(math.abs(e10(seg)._3 - nz05 / 2.0) <= 1e-4 + 1e-9,
        s"$seg: ${e10(seg)._3} vs ${nz05 / 2.0}") }
    // noise is nonzero for at least one group (the mechanism is live)
    assert(e05.values.exists(_._3 != 0.0))
    // deterministic across invocations (seeded uniform)
    assert(rows(0.5) == e05)
  }

  test("coherent split kills every cross-split leak without losing pairs") {
    def matrix(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val leaky = matrix(Pipeline.splitLeakage(spark, sfDir))
    val fixed = matrix(Pipeline.coherentSplitAudit(spark, sfDir))
    // cluster-keyed assignment leaves no off-diagonal rows
    fixed.foreach { case ((s1, s2), (_, cross)) =>
      assert(s1 == s2 && !cross, s"leak survived: $s1 -> $s2") }
    // same candidate pairs, just reassigned: totals match
    assert(fixed.values.map(_._1).sum == leaky.values.map(_._1).sum)
  }
}
