package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema.
  *
  * At cluster scale these would be catalog tables (bucketed on their
  * join keys); here we read the driver's single-file parquet dirs.
  * Column pruning + predicate pushdown still apply (v2 parquet scan).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` column has shipped as BOTH
    * TIMESTAMP(NANOS) (older generators — Spark's vectorized reader
    * rejects it, so it's read as BIGINT nanos via the legacy conf)
    * and timestamp[us] (current generator — inferred TIMESTAMP_NTZ).
    * Either way the exposed `ts` is epoch MICROseconds as BIGINT
    * (matching DuckDB's `epoch_us(ts)` on the same file), so all
    * event-time arithmetic downstream is exact integer micros. The
    * NTZ→epoch conversion is `timestampdiff(MICROSECOND, epoch,
    * ts)` over two NTZ operands — wall-clock arithmetic with NO
    * session-timezone dependence (the stored values are UTC wall
    * times and DuckDB's epoch_us is timezone-free), so the loader
    * never mutates the caller session's timeZone conf. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
    }
  }

  /** Formats epoch micros as a session-tz-independent TIMESTAMP_NTZ
    * literal (UTC wall time) for pushdown-safe bounds on NTZ scans. */
  private def ntzLit(micros: Long): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val str = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").format(ldt)
    s"TIMESTAMP_NTZ '$str'"
  }

  /** [[events]] with event-time bounds (inclusive, in epoch MICROS)
    * applied to the STORED column BEFORE the µs conversion — a
    * predicate on the derived integer-micros column defeats parquet
    * pushdown entirely (the scan would read every row group), while
    * the equivalent bound on the stored representation reaches the
    * row-group statistics. Two storage branches:
    * - legacy nanos-as-BIGINT: for the non-negative ts domain,
    *   `ts_us >= m ⟺ ts_ns >= m·1000` and
    *   `ts_us <= m ⟺ ts_ns <= m·1000 + 999`;
    * - timestamp[us] (TIMESTAMP_NTZ): the micros bound IS the stored
    *   granularity — the bound becomes a TIMESTAMP_NTZ literal
    *   (formatted as a UTC wall time, independent of session tz), a
    *   same-type comparison the scan pushes down.
    * At 100 TB this is the difference between a time-travel /
    * incremental read scanning one day and scanning the corpus
    * (PlanSpec-pinned in IncrementalSpec). */
  def eventsTsBounded(s: SparkSession, d: String,
      minMicros: Option[Long] = None,
      maxMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        minMicros.foreach(m => raw = raw.filter(col("ts") >= m * 1000L))
        maxMicros.foreach(m => raw = raw.filter(col("ts") <= m * 1000L + 999L))
        raw.withColumn("ts", expr("ts div 1000"))
      case _ =>
        minMicros.foreach(m => raw = raw.filter(expr(s"ts >= ${ntzLit(m)}")))
        maxMicros.foreach(m => raw = raw.filter(expr(s"ts <= ${ntzLit(m)}")))
        raw.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** r17 optimization (guide §2.5, unsplittable-input treatment):
    * spread `df` across the session's full parallelism when its scan
    * yields fewer partitions than cores — the local single-file
    * parquet datasets otherwise serialize every downstream per-row
    * computation (md5 shingling, vector quantization, codec decode)
    * onto ONE task. Identity — no shuffle — whenever the scan is
    * already at least core-parallel, which is every cluster-scale
    * layout; the round-robin exchange is deterministic
    * (sortBeforeRepartition, default on) and every operator in this
    * library is partition- and order-invariant by construction (the
    * oracle-replayability house rule), so results are unchanged. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val want = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** [[spread]] with the session taken from the frame. */
  def spread(df: DataFrame): DataFrame = spread(df.sparkSession, df)
}
