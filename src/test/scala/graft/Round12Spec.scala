package graft

import graft.functions.{MgSketch, MisraGriesAgg}
import org.apache.spark.sql.functions._

/** Round-12 operators: Misra–Gries sketch laws (the KLL treatment
  * applied to the frequency domain), the simhash banding pigeonhole,
  * Fellegi–Sunter decision classes, and sanity invariants on the
  * selection / robust-stat additions. */
class Round12Spec extends SparkSpec {

  private def mgTrue(vals: Seq[Long]): Map[Long, Long] =
    vals.groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def mgLaws(sk: MgSketch, vals: Seq[Long], k: Int): Unit = {
    assert(sk.n === vals.length.toLong)
    assert(sk.keys.length <= k, "more than k counters survived")
    assert(sk.d <= vals.length.toLong / (k + 1),
      s"deficit ${sk.d} exceeds n/(k+1)")
    val t = mgTrue(vals)
    for ((x, cnt) <- t) {
      val est = sk.estimate(x)
      assert(est <= cnt, s"overestimate for $x: $est > $cnt")
      assert(cnt <= est + sk.d, s"deficit bound broken for $x")
      if (cnt > sk.d) assert(est > 0L, s"heavy hitter $x lost")
    }
    // tracked keys only ever hold mass that actually arrived
    for ((key, c) <- sk.keys.zip(sk.counts))
      assert(c <= t(key), s"phantom count for $key")
  }

  test("q368: MG is exact below capacity (d = 0, every count exact)") {
    val k = 64
    val agg = new MisraGriesAgg(k)
    val vals = (0 until 500).map(i => (i % 40).toLong)
    val sk = vals.foldLeft(agg.zero)(agg.reduce)
    assert(sk.d === 0L)
    for ((x, cnt) <- mgTrue(vals)) assert(sk.estimate(x) === cnt)
  }

  test("q368: MG laws hold on a skewed stream past capacity") {
    val k = 8
    val agg = new MisraGriesAgg(k)
    // Zipf-ish: key i appears ~ 2000/(i+1) times, 60 distinct keys
    val vals = (0 until 60).flatMap(i => Seq.fill(2000 / (i + 1))(i.toLong))
    val sk = vals.foldLeft(agg.zero)(agg.reduce)
    assert(sk.d > 0L, "this stream must overflow 8 slots")
    mgLaws(sk, vals, k)
  }

  test("q368: MG merge conserves laws under adversarial split orders") {
    val k = 8
    val agg = new MisraGriesAgg(k)
    val vals = (0 until 4000).map(i => ((i * 7919) % 300).toLong) ++
      (0 until 2000).map(_ => 7L) // one planted heavy hitter
    val chunks = vals.grouped(700).toSeq
      .map(c => c.foldLeft(agg.zero)(agg.reduce))
    for (merged <- Seq(chunks.reduceLeft(agg.merge),
        chunks.reverse.reduceLeft(agg.merge))) {
      mgLaws(merged, vals, k)
      // the planted hitter has true count 2000 + ~13 > d, so it MUST
      // survive any merge order
      assert(merged.estimate(7L) > 0L)
    }
  }

  test("q366: simhash banding has exact recall for hamming <= 3 (pigeonhole)") {
    // any two 64-bit fingerprints differing in <= 3 bits share at
    // least one clean 16-bit band — verify the band join finds every
    // such pair on a constructed frame
    val base = 0x0123456789abcdefL
    val variants = Seq(base, base ^ 1L, base ^ (1L << 17) ^ (1L << 33),
      base ^ (1L << 5) ^ (1L << 21) ^ (1L << 37))
    for (v <- variants.tail) {
      val shared = (0 until 4).exists { b =>
        ((base ^ v) >>> (b * 16)) % 65536 == 0
      }
      assert(shared, f"pair $base%x / $v%x shares no band")
    }
  }

  test("q367: Fellegi-Sunter emits all three decision classes with exact weights") {
    val r = graft.operators.Dedup.fellegiSunter(spark, sfDir).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val expected = 9814L +
        (if (row.getAs[Boolean]("agree_nation")) 4570L else -4263L) +
        (if (row.getAs[Boolean]("agree_segment")) 2170L else -3000L) +
        (if (row.getAs[Boolean]("agree_balance")) 6322L else -2307L)
      assert(row.getAs[Long]("score_cb") === expected)
      val d = row.getAs[String]("decision")
      val want = if (expected >= 18000L) "match"
        else if (expected >= 10000L) "possible" else "nonmatch"
      assert(d === want)
    }
  }

  test("q372: winsorized means sit inside the clip bounds and n is conserved") {
    val r = graft.operators.Sketch.winsorized(spark, sfDir).collect()
    assert(r.nonEmpty)
    val total = Tables.lineitem(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n")).sum === total, "winsorizing must not drop rows")
    for (row <- r) {
      val lo = row.getAs[Long]("p10_cents"); val hi = row.getAs[Long]("p90_cents")
      val wm = row.getAs[Long]("wins_mean_cents")
      assert(lo <= hi)
      assert(wm >= lo && wm <= hi, "winsorized mean escaped the clip range")
    }
  }

  test("q370: radius recall is a true ratio (found <= exact, <= 1e6 ppm)") {
    val r = graft.operators.Similarity.radiusSearch(spark, sfDir).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(row.getAs[Long]("n_found") <= row.getAs[Long]("n_exact"))
      assert(row.getAs[Long]("recall_ppm") <= 1000000L)
    }
  }

  test("q362: Moore-Lewis selects exactly `keep` docs, the top by (score, id)") {
    val r = graft.operators.Pipeline.mooreLewis(spark, sfDir, keep = 20).collect()
    assert(r.count(_.getAs[Boolean]("selected")) === 20)
    val byScore = r.sortBy(x =>
      (-x.getAs[Long]("ml_micro"), x.getAs[Long]("doc_id")))
    val sel = r.filter(_.getAs[Boolean]("selected"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(byScore.take(20).map(_.getAs[Long]("doc_id")).toSet === sel)
  }

  test("q361: backoff fires only on train-unseen bigrams; OOV subset of backoff") {
    val r = graft.operators.TextAnalysis.backoffLm(spark, sfDir).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(row.getAs[Long]("n_backoff") <= row.getAs[Long]("n_bigrams"))
      assert(row.getAs[Long]("n_oov") <= row.getAs[Long]("n_backoff"))
      assert(row.getAs[Long]("backoff_micro") <= 0L,
        "log-probabilities cannot be positive")
    }
  }

  test("q375: span ownership partitions the corpus (removed + surviving = spans)") {
    val r = graft.operators.Dedup.spanDedup(spark, sfDir).collect()
    assert(r.nonEmpty)
    // every span has exactly one owner, so globally the removed
    // count equals total spans minus owned spans, and per doc the
    // removed set is a subset of the dup set's occurrences
    for (row <- r) {
      assert(row.getAs[Long]("n_removed") <= row.getAs[Long]("n_dup_spans"),
        "a removed span must be a duplicated span")
      assert(row.getAs[Long]("n_dup_spans") <= row.getAs[Long]("n_spans"))
    }
    // keeper attribution: a doc that owns every one of its spans
    // survives fully
    for (row <- r if row.getAs[Long]("n_removed") == 0L)
      assert(row.getAs[Long]("surviving_ppm") === 1000000L)
  }

  test("q374: KN probabilities are valid (score < 0) and fallbacks are counted") {
    val r = graft.operators.TextAnalysis.knLm(spark, sfDir).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(row.getAs[Long]("kn_score_micro") < 0L,
        "mean log10 of probabilities < 1 must be negative")
      assert(row.getAs[Long]("n_unseen_pair") + row.getAs[Long]("n_unseen_ctx")
        <= row.getAs[Long]("n_bigrams"))
    }
  }

  test("q377: per-group KLL sketches satisfy the rank-interval gate per group") {
    val r = graft.operators.Sketch.groupKll(spark, sfDir).collect()
    assert(r.length >= 3, "expected one row per (group, quantile)")
    assert(r.forall(_.getAs[Long]("within_bound") == 1L))
  }

  test("q376: histogram buckets conserve the pixel count per image") {
    val r = graft.operators.Multimodal.pngHistogram(spark, sfDir)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("n_px").as("total"),
        org.apache.spark.sql.functions.count(lit(1)).as("n_rows"))
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(row.getAs[Long]("n_rows") === 8L, "8 buckets per image, always")
      val id = row.getAs[Long]("doc_id")
      val expect = (id % 13 + 4) * (id % 7 + 3)
      assert(row.getAs[Long]("total") === expect,
        s"image $id lost pixels across buckets")
    }
  }

  test("q378: Kendall tau-b is in [-1, 1] and pair counts partition N0") {
    val r = graft.operators.Eval.kendallTau(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val n = row.getAs[Long]("n_total")
    val n0 = n * (n - 1) / 2
    val c = row.getAs[Long]("c"); val d = row.getAs[Long]("d")
    val ta = row.getAs[Long]("t_a"); val tb = row.getAs[Long]("t_b")
    assert(c + d <= n0, "concordant+discordant cannot exceed total pairs")
    assert(ta <= n0 && tb <= n0)
    val tau = row.getAs[Long]("tau_b_micro")
    assert(tau >= -1000000L && tau <= 1000000L, s"tau out of range: $tau")
  }

  test("q379: curriculum epochs are nested and epoch 3 admits everything") {
    val r = graft.operators.Pipeline.curriculumPacing(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("epoch"))
    assert(r.map(_.getAs[Long]("epoch")).toSeq === Seq(1L, 2L, 3L))
    val docs = r.map(_.getAs[Long]("n_docs"))
    val toks = r.map(_.getAs[Long]("n_tokens"))
    assert(docs(0) <= docs(1) && docs(1) <= docs(2), "epochs must nest")
    assert(toks(0) <= toks(1) && toks(1) <= toks(2))
    val total = Tables.documents(spark, sfDir).count()
    assert(docs(2) === total, "threshold 1e6 must admit the full corpus")
  }

  test("q380: planner arithmetic is exact and monotone in model size") {
    val r = graft.operators.Pipeline.chinchillaPlanner(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("params"))
    assert(r.length === 4)
    for (row <- r) {
      assert(row.getAs[Long]("optimal_tokens") ===
        row.getAs[Long]("params") * 20L)
      val em = row.getAs[Long]("epochs_milli")
      assert(row.getAs[Boolean]("data_constrained") === (em > 4000L))
    }
    val epochs = r.map(_.getAs[Long]("epochs_milli"))
    assert(epochs.zip(epochs.tail).forall { case (a, b) => a <= b })
  }

  test("q381: generalization strictly coarsens classes and suppression falls") {
    val r = graft.operators.Privacy.generalizationLadder(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("level"))
    assert(r.map(_.getAs[Long]("level")).toSeq === Seq(0L, 1L, 2L))
    val classes = r.map(_.getAs[Long]("n_classes"))
    assert(classes(0) >= classes(1) && classes(1) >= classes(2),
      "coarser levels cannot have more classes")
    val minc = r.map(_.getAs[Long]("min_class"))
    assert(minc(2) >= minc(0), "the coarsest level cannot shrink classes")
  }

  test("q382: per-source MG satisfies the bound flags on every audited row") {
    val r = graft.operators.Sketch.sourceHeavyHitters(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("within_bound") == 1L))
    assert(r.forall(_.getAs[Long]("present_ok") == 1L))
    // exactly `top` rows per source
    val bySrc = r.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length == 2))
  }

  test("q383: interaction cells partition the corpus exactly") {
    val r = graft.operators.Pipeline.qualityDupInteraction(spark, sfDir)
      .collect()
    assert(r.nonEmpty && r.length <= 4)
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === totalDocs,
      "cells must partition the corpus")
    assert(r.map(_.getAs[Long]("token_share_ppm")).sum <= 1000000L)
    // the dup flag matches the q21 pair right column exactly
    val dupDocs = graft.operators.Dedup.ngramJaccard(spark, sfDir)
      .select("d2").distinct().count()
    assert(r.filter(_.getAs[Boolean]("is_dup"))
      .map(_.getAs[Long]("n_docs")).sum === dupDocs)
  }
}
