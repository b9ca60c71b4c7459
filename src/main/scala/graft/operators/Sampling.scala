package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling (LLM-pipeline operators).
  *
  * Sampling at 100 TB must be reproducible across reruns, engines and
  * partitionings — `rand()` is none of those. These operators derive
  * the keep decision from md5 of a salted key: the same rows are
  * sampled on every engine (the oracle replays the hash math), the
  * operator is a narrow codegen'd filter with full pushdown below it,
  * and changing the salt re-rolls the sample.
  */
object Sampling {

  /** First 8 md5 hex nibbles of `e` as an integer in [0, 2^32). */
  def hashBucket(e: Column): Column =
    conv(substring(md5(e.cast("binary")), 1, 8), 16, 10).cast("long")

  /** q132: JOIN-CONSISTENT (coherent) sampling — both fact tables
    * sampled by the SAME md5 bucket of the JOIN KEY, so the join of
    * the samples IS an unbiased 1/`buckets` sample of the join
    * (sampling each side independently by row would keep ~1/b² of
    * the matches and bias toward nothing; keying both filters on
    * hash(join key) keeps every match whose key survives). This is
    * how a 100 TB planner estimates join aggregates without running
    * the join: each side's filter is a narrow codegen predicate
    * pushed below the join — the sampled join touches 1/b of each
    * scan and of the shuffle. The scaled estimate lands next to the
    * exact total (the audit side, one map-side-combinable agg per
    * table) with everything in exact integer cents, so the estimate
    * AND its sampling error replay on both engines. */
  def coherentSample(s: SparkSession, dir: String,
      buckets: Int = 16): DataFrame = {
    def keep(key: Column) =
      hashBucket(concat(lit("cs|"), key.cast("string"))) % buckets === 0
    val o = Tables.orders(s, dir).filter(keep(col("o_orderkey")))
      .select(col("o_orderkey"))
    val l = Tables.lineitem(s, dir).filter(keep(col("l_orderkey")))
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val sample = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders_sample"),
        count(lit(1)).as("n_items_sample"),
        sum(col("cents")).as("revenue_sample_cents"))
    val exact = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("revenue_exact_cents"))
    sample.crossJoin(exact) // two single-row frames
      .select(col("n_orders_sample"), col("n_items_sample"),
        col("revenue_sample_cents"),
        (col("revenue_sample_cents") * buckets).as("revenue_est_cents"),
        col("revenue_exact_cents"),
        round(abs(col("revenue_sample_cents") * buckets - col("revenue_exact_cents"))
          / col("revenue_exact_cents").cast("double"), 4).as("rel_err"))
  }

  /** q54: Bernoulli sample at rate p keyed on doc_id — keep iff
    * bucket < p·2^32. */
  def hashSample(s: SparkSession, dir: String, p: Double = 0.1,
      salt: String = "sample"): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        hashBucket(concat(lit(s"$salt|"), col("doc_id").cast("string"))).as("bucket"))
      .filter(col("bucket") < math.floor(p * 4294967296.0).toLong)

  /** q55: stratified sampling audit — per-language keep counts at a
    * 20% rate, verifying the sampler is unbiased per stratum. The
    * aggregate output is what a pipeline health check consumes. */
  def stratifiedSample(s: SparkSession, dir: String, p: Double = 0.2,
      salt: String = "strata"): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        (hashBucket(concat(lit(s"$salt|"), col("doc_id").cast("string")))
          < math.floor(p * 4294967296.0).toLong).as("kept"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col("lang"), col("n_docs"), col("n_sampled"),
        round(col("n_sampled").cast("double") / col("n_docs"), 4).as("rate"))

  /** q96: deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each doc draws u from the md5 bucket
    * family, its key is ln(u)/w (maximizing u^(1/w)), and the k
    * largest keys win. Token-weighted corpus subsampling needs
    * exactly this: sampling probability ∝ n_chars, reproducible
    * across engines, partitionings and reruns — no rand(), no
    * reservoir state.
    *
    * Scale shape: a narrow codegen'd key expression + a bounded
    * top-k (at 100 TB: per-partition top-k partial agg then one
    * k-row reduce — Spark's TakeOrderedAndProject, no full sort of
    * the corpus; only k rows ever cross the shuffle). SELECTION
    * orders by the ppm-rounded key (key_ppm), not the raw double:
    * a cross-engine libm ln() ulp difference near the k-th boundary
    * could otherwise pick different docs; rounding quantizes the
    * boundary and doc_id breaks the (now possible) ties
    * deterministically on both engines.
    */
  /** q102: exact-quota stratified sampling — EXACTLY k docs per
    * language (the fixed-budget complement of q55's rate-based
    * sampler: "give me 20 eval docs per language", reproducibly).
    * Selection = the k smallest md5 buckets per stratum, which is a
    * uniform k-subset and deterministic across engines/partitionings.
    *
    * Scale shape: [[graft.functions.TopKAgg]] per stratum — a
    * bounded k-buffer on the map side, ≤ k rows per (partition ×
    * stratum) across the shuffle; the window-rank formulation would
    * sort every doc of a language in one task (the q66 skew killer,
    * avoided outright here). Ties (bucket collisions) break by
    * doc_id inside the aggregator, mirroring the oracle's ORDER BY
    * (bucket, doc_id). */
  def quotaSample(s: SparkSession, dir: String, k: Int = 20,
      salt: String = "quota"): DataFrame = {
    import graft.functions.TopK
    val b = hashBucket(concat(lit(s"$salt|"), col("doc_id").cast("string")))
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), b.as("bucket"))
      .groupBy(col("lang"))
      // score = -bucket: TopK keeps (score desc, id asc) = smallest
      // buckets first; buckets < 2^32 are exact in double
      .agg(TopK.topk(k)(col("doc_id"), negate(col("bucket").cast("double"))).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), negate(col("t.score")).cast("long").as("bucket"))
  }

  def weightedSample(s: SparkSession, dir: String, k: Int = 50,
      salt: String = "wsample"): DataFrame = {
    val u = (hashBucket(concat(lit(s"$salt|"), col("doc_id").cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").as("weight"),
        round((log(u) / col("n_chars").cast("double")) * 1e6, 4).as("key_ppm"))
      .orderBy(col("key_ppm").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("weight"), col("key_ppm"))
  }

  /** q239: EPOCH-SHUFFLE manifest — the reproducible data-loader
    * order a training run needs: per epoch, every doc lands in a
    * hash shard with a position, the whole ordering a pure function
    * of (epoch, doc_id) — re-runnable byte-identically on any
    * cluster (seeded-hash order, the q54 construction; no
    * Math.random anywhere), and DIFFERENT across epochs because
    * the salt carries the epoch (the decorrelation that stops the
    * model from seeing the same neighbor pairs every epoch). The
    * only sorts are per-(epoch, shard) windows — each bounded by
    * corpus/shards, the loader's own shard-file size; at 100 TB
    * you raise `shards` so a shard's manifest fits one task, which
    * is the same knob the loader already has. */
  def epochShuffle(s: SparkSession, dir: String, epochs: Int = 2,
      shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("hb"), col("doc_id"))
    Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("epoch",
        explode(sequence(lit(0L), lit((epochs - 1).toLong))))
      .withColumn("hb", hashBucket(concat(lit("epoch"),
        col("epoch").cast("string"), lit("|"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("hb"), lit(shards.toLong)))
      .withColumn("position", (row_number().over(w) - 1).cast("long"))
      .select(col("epoch"), col("shard"), col("position"), col("doc_id"))
  }

  /** q470: NEYMAN OPTIMAL ALLOCATION of an eval-annotation budget
    * across languages (Neyman 1934) — the sampling design q55's
    * proportional strata deliberately aren't: when strata differ in
    * VARIANCE, minimum-variance estimation allocates n_h ∝ N_h·σ_h
    * (volatile strata earn more samples per document) — the "where
    * do my 10k human labels buy the most precision" decision a
    * quality-eval budget actually makes. Exact per-language moments
    * (squares on DECIMAL(38,0) INTERNAL), ONE milli-rounded sqrt per
    * bounded language row, integer largest-remainder apportionment
    * (floor allocations + leftovers by (remainder desc, lang) over
    * the bounded frame) so the allocations sum EXACTLY to the
    * budget on both engines. Zero-variance strata honestly draw
    * weight 0. */
  def neymanAllocation(s: SparkSession, dir: String,
      budget: Long = 10000L): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val g = Tables.documents(s, dir)
      .select(col("lang"), size(toks).cast("long").as("x"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"))
      .filter(col("n_docs") >= 2)
      // σ in milli: one IEEE sqrt per bounded language row
      .withColumn("s_milli", expr(
        """CAST(round(sqrt(CAST(CAST(n_docs AS DECIMAL(38,0)) * s2
          |   - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
          |  / (CAST(n_docs AS DOUBLE) * (n_docs - 1))) * 1e3)
          | AS BIGINT)""".stripMargin))
      .withColumn("w", expr(
        "CAST(CAST(n_docs AS DECIMAL(38,0)) * s_milli AS DECIMAL(38,0))"))
      .localCheckpoint() // bounded: |langs| rows
    val tot = g.agg(sum(col("w")).as("wsum"))
    val base = g.crossJoin(broadcast(tot))
      .withColumn("floor_alloc", expr(
        s"CAST(w * $budget div nullif(wsum, 0) AS BIGINT)"))
      .withColumn("rem", expr(
        s"CAST(w * $budget - CAST(w * $budget div nullif(wsum, 0)"
          + s" AS DECIMAL(38,0)) * wsum AS DECIMAL(38,0))"))
    val leftover = base.agg(
      (lit(budget) - sum(col("floor_alloc"))).as("left"))
    base.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("lang"))).cast("long"))
      .select(col("lang"), col("n_docs"), col("s_milli"),
        (col("floor_alloc") +
          when(col("rk") <= col("left"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
