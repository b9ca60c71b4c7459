package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Approximate-counting sketches (LLM-pipeline operators).
  *
  * A count-min sketch answers "how often does token X appear in the
  * 100 TB corpus" from d·w counters instead of a |vocab|-sized exact
  * table: each occurrence increments one counter per hash row, the
  * estimate is the min over rows (always ≥ truth). The hash family is
  * the md5 bucket family, so the sketch — and its error — is
  * bit-reproducible across engines and replayable by the oracle.
  */
object Sketch {

  /** q60: build a d=4 × w=256 count-min sketch over corpus tokens,
    * then audit it against the exact top-20 counts (est ≥ n always;
    * est−n is the collision error). The sketch build is one groupBy of
    * (row, bucket) — 1024 counters regardless of corpus size; the
    * exact side exists only as the audit. */
  def countMinAudit(s: SparkSession, dir: String, rows: Int = 4,
      buckets: Int = 256): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
    def bucket(r: Int) =
      Sampling.hashBucket(concat(lit(s"cm$r|"), col("tok"))) % buckets
    val hashed = tok.select(col("tok"),
      explode(array((0 until rows).map(r =>
        struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("tok"), col("rb.r").as("r"), col("rb.b").as("b"))
    val sketch = hashed.groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
    val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(20)
    val topBuckets = top.select(col("tok"), col("n"),
      explode(array((0 until rows).map(r =>
        struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("tok"), col("n"), col("rb.r").as("r"), col("rb.b").as("b"))
    topBuckets.join(sketch, Seq("r", "b"))
      .groupBy(col("tok"), col("n"))
      .agg(min(col("cnt")).as("est"))
      .select(col("tok").as("token"), col("n"), col("est"))
  }
}
