package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** The q174–q182 family: model-eval statistics, layout audits, and
  * the incremental-components algebra. Properties, not smoke — the
  * AUC identities, the super-node merge equivalence, the b-bit
  * domination invariant, and the plan shapes.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q174 AUC identities: separation=1e6, reversed=0, all-tied=500000") {
    def auc(rows: Seq[(Long, Long)]): Long =
      Eval.aucOf(rows.toDF("score", "pos")).collect()(0).getAs[Long]("auc_ppm")
    // perfectly separated: every positive outscores every negative
    assert(auc(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))) === 1000000L)
    // reversed: every negative outscores every positive
    assert(auc(Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L))) === 0L)
    // all tied: midrank gives exactly 1/2
    assert(auc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))) === 500000L)
    // mixed with a tie straddling the classes: hand-computed
    // scores: pos {3, 2}, neg {2, 1}: pairs = 4, wins = 3, tie = 1
    // AUC = (3 + 0.5) / 4 = 0.875
    assert(auc(Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L))) === 875000L)
  }

  test("q176 PSI contributions are non-negative and cover all 12 bins") {
    val rows = Eval.psiDrift(spark, sfDir).collect()
    assert(rows.length === 12)
    assert(rows.forall(_.getAs[Double]("psi_contrib") >= 0.0),
      "PSI per-bin term (p-q)ln(p/q) must be >= 0")
    // the injected +40 shift must be DETECTED: total PSI over the
    // healthy-identical split would be ~0; with the shift it is not
    val total = rows.map(_.getAs[Double]("psi_contrib")).sum
    assert(total > 0.01, s"injected drift not detected (PSI=$total)")
  }

  test("q178 precision audit is internally consistent") {
    val r = Dedup.lshPrecisionAudit(spark, sfDir).collect()(0)
    val (cand, t, p) = (r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_true"), r.getAs[Long]("precision_ppm"))
    assert(t <= cand && p <= 1000000L)
    assert(p === t * 1000000L / cand)
  }

  test("q180 z-order: aligned box clusters into fewer blocks than row-major") {
    val r = Bucketing.zorderLocality(spark, sfDir).collect()(0)
    val zt = r.getAs[Long]("z_blocks_touched")
    val lt = r.getAs[Long]("lin_blocks_touched")
    assert(r.getAs[Long]("n_box_rows") > 0, "box query matched no rows")
    // a 4x4 aligned box is exactly one 16-cell z-block; row-major
    // scatters it across one block per distinct u value present
    assert(zt === 1L)
    assert(lt >= zt)
  }

  test("q181 incremental components ≡ full recompute (super-node algebra)") {
    val full = Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(Dedup.components(Dedup.minhashLsh(spark, sfDir)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    val inc = Dedup.incrementalComponents(spark, sfDir)
    assert(inc.count() === full.count())
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty,
      "incremental label set diverges from full recompute")
  }

  test("q182 b-bit agreement dominates full-signature agreement") {
    // a matching 128-bit minhash always matches in its low bit, so
    // a8 >= m8 row-by-row; estimates stay in [0, 1e6]
    val rows = Dedup.bbitMinhashAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a8") >= r.getAs[Long]("m8"))
      assert(r.getAs[Long]("est_b1_ppm") >= 0L &&
        r.getAs[Long]("est_b1_ppm") <= 1000000L)
      assert(r.getAs[Long]("est_full_ppm") >= 0L &&
        r.getAs[Long]("est_full_ppm") <= 1000000L)
    }
  }

  test("q179 schema-evolution read conserves the event count") {
    val total = Tables.events(spark, sfDir).count()
    val merged = Bucketing.schemaEvolution(spark, sfDir)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(merged === total, "generation split lost or duplicated rows")
  }

  test("q183 nDCG: dcg never exceeds the constant ideal; ppm bounded") {
    val rows = Eval.ndcgEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dcg_ppm") <= Eval.NdcgIdeal)
      assert(r.getAs[Long]("idcg_ppm") === Eval.NdcgIdeal)
      assert(r.getAs[Long]("ndcg_ppm") >= 0L && r.getAs[Long]("ndcg_ppm") <= 1000000L)
    }
  }

  test("q184 bootstrap CI brackets and orders correctly") {
    val r = Eval.bootstrapCi(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_replicates") === 100L)
    val (lo, hi) = (r.getAs[Long]("ci_lo_milli"), r.getAs[Long]("ci_hi_milli"))
    assert(lo <= hi)
    // the percentile interval should bracket the point estimate on
    // any non-degenerate corpus (Poisson weights are mean-1)
    val mean = r.getAs[Long]("mean_milli")
    assert(lo <= mean && mean <= hi)
  }

  test("q186 media keep-list partitions the eligible corpus") {
    val eligible = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 65).count()
    val rows = Multimodal.mediaCanonical(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum === eligible)
    rows.foreach(r => assert(r.getAs[Long]("keep_bytes") >= 65L))
  }

  test("q187 stemmer conflates (injected inflection) and shrinks vocab") {
    val r = TextAnalysis.stemVocabAudit(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("vocab_stems") <= r.getAs[Long]("vocab_surface"))
    assert(r.getAs[Long]("n_merged_stems") > 0L,
      "conflation path not exercised — injected inflection missing")
  }

  test("q188 folds partition the user population") {
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    val rows = Eval.groupKfold(spark, sfDir).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
  }

  test("q189 EWMA baseline is positive and the alarm bit matches its own inputs") {
    val rows = Events.ewmaSpikes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ewma_milli") >= 0L)
      // alarm ⇔ n > 2·ewma, replayed from the row's own columns
      // (255·n > 2·num ⟺ n·1000 > 2·(num·1000/255) up to the floor —
      // check the exact cross-multiplied form via reconstruction)
      val n = r.getAs[Long]("n")
      val ewmaMilli = r.getAs[Long]("ewma_milli")
      val spike = r.getAs[Long]("spike")
      if (spike == 1L) assert(n * 1000L > 2L * ewmaMilli,
        s"spike row violates n > 2*ewma: n=$n ewma_milli=$ewmaMilli")
    }
  }

  test("q190 PR sweep: 11 thresholds, recall monotone non-increasing, t=0 has recall 1") {
    val rows = Eval.prCurve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("threshold_ppm"))
    assert(rows.length === 11)
    assert(rows.head.getAs[Long]("recall_ppm") === 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_pred_pos"))
    }
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    recalls.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("q191 seasonal profile is bounded by 24 rows and spike counts by day counts") {
    val rows = Events.seasonalSpikes(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 24)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_spikes") <= r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("mean_milli") > 0L)
    }
  }

  test("new-family plans: no cartesians; q177 top-k is TakeOrdered") {
    // (q176/q177's one-row totals broadcast is the documented
    // cross-join-of-one scalar pattern, not a corpus cross product —
    // the CartesianProduct check still applies to them)
    for ((name, df) <- Seq(
        "q174" -> Eval.aucRank(spark, sfDir),
        "q175" -> Eval.calibrationReport(spark, sfDir),
        "q176" -> Eval.psiDrift(spark, sfDir),
        "q177" -> TextAnalysis.pmiCollocations(spark, sfDir),
        "q178" -> Dedup.lshPrecisionAudit(spark, sfDir),
        "q180" -> Bucketing.zorderLocality(spark, sfDir),
        "q182" -> Dedup.bbitMinhashAudit(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
    }
    for ((name, df) <- Seq(
        "q174" -> Eval.aucRank(spark, sfDir),
        "q175" -> Eval.calibrationReport(spark, sfDir),
        "q178" -> Dedup.lshPrecisionAudit(spark, sfDir),
        "q180" -> Bucketing.zorderLocality(spark, sfDir),
        "q182" -> Dedup.bbitMinhashAudit(spark, sfDir))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name has a nested-loop join")
    }
    val p177 = plan(TextAnalysis.pmiCollocations(spark, sfDir))
    assert(p177.contains("TakeOrderedAndProject"),
      "q177 top-20 must be TakeOrderedAndProject, not a global sort")
    val p185 = plan(Events.pathTopK(spark, sfDir))
    assert(p185.contains("TakeOrderedAndProject"),
      "q185 top-10 must be TakeOrderedAndProject, not a global sort")
  }
}
