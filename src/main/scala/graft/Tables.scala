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
    * NTZ→epoch conversion pins the session timezone to UTC first —
    * the stored values are UTC epochs, and DuckDB's epoch_us is
    * timezone-free. Confs are dynamic, so this works in any
    * caller-provided session. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions
          .expr("unix_micros(cast(ts as timestamp))"))
    }
  }
  /** [[events]] with event-time bounds (inclusive, in epoch MICROS)
    * applied to the STORED nanos column BEFORE the µs truncation —
    * a predicate on the derived `ts div 1000` defeats parquet
    * pushdown entirely (the scan would read every row group), while
    * the equivalent bound on raw nanos reaches the row-group
    * statistics: for the non-negative ts domain,
    * `ts_us >= m ⟺ ts_ns >= m·1000` and
    * `ts_us <= m ⟺ ts_ns <= m·1000 + 999`. At 100 TB this is the
    * difference between a time-travel/incremental read scanning one
    * day and scanning the corpus (PlanSpec-pinned). */
  def eventsTsBounded(s: SparkSession, d: String,
      minMicros: Option[Long] = None,
      maxMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    var raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        minMicros.foreach(m => raw = raw.filter(col("ts") >= m * 1000L))
        maxMicros.foreach(m => raw = raw.filter(col("ts") <= m * 1000L + 999L))
        raw.withColumn("ts", expr("ts div 1000"))
      case _ =>
        // timestamp[us] storage: the micros bound IS the stored
        // granularity — fold to an NTZ literal so it reaches the
        // row-group statistics (cast(LTZ→NTZ) is foldable under the
        // UTC session tz pinned above).
        minMicros.foreach(m => raw = raw.filter(
          col("ts") >= expr(s"cast(timestamp_micros(${m}L) as timestamp_ntz)")))
        maxMicros.foreach(m => raw = raw.filter(
          col("ts") <= expr(s"cast(timestamp_micros(${m}L) as timestamp_ntz)")))
        raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
