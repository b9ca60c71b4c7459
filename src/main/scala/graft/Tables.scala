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
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as BIGINT nanos and truncate to epoch
    * MICROseconds (matching how DuckDB reads the same file — it
    * truncates ns→us on scan). All event-time arithmetic is exact
    * integer microseconds. The conf is dynamic, so this works in any
    * caller-provided session. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("ts div 1000"))
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
    var raw = load(s, d, "events")
    minMicros.foreach(m => raw = raw.filter(col("ts") >= m * 1000L))
    maxMicros.foreach(m => raw = raw.filter(col("ts") <= m * 1000L + 999L))
    raw.withColumn("ts", expr("ts div 1000"))
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
