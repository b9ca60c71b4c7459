package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the embeddings table (SURVEY §2.D).
  *
  * Oracle-parity trick: embeddings are quantized to integer
  * micro-units (round(x⋅10⁶) as BIGINT) so dot products and norms are
  * EXACT integer arithmetic — bit-identical across engines and across
  * any summation order. Cosine = intDot / (√n2a·√n2b) is then a fixed
  * IEEE double expression. Quantization error on cosine is < 1e-5 —
  * and int8/int16-quantized vector search is the standard production
  * technique at 100 TB anyway (4-8× less memory bandwidth).
  */
object Similarity {

  /** vec_id, v: quantized int vector, n2: exact squared norm. */
  def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("v"))
      .withColumn("n2", org.apache.spark.sql.graft.LongArrayDot.column(col("v"), col("v")))

  /** Exact integer dot product of two quantized vectors — a custom
    * codegen Catalyst expression (see [[org.apache.spark.sql.graft.LongArrayDot]]);
    * identical values to the interpreted fold, ~30× faster. */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.LongArrayDot.column(a, b)

  def cosineQ(va: Column, vb: Column, n2a: Column, n2b: Column): Column =
    dotQ(va, vb).cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** q24: embedding-cosine near-duplicate pairs (threshold 0.4). */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val q = quantized(s, dir)
    val a = q.toDF("id1", "v1", "n21")
    val b = q.toDF("id2", "v2", "n22")
    a.join(b, col("id1") < col("id2"))
      .withColumn("cosine", cosineQ(col("v1"), col("v2"), col("n21"), col("n22")))
      .filter(col("cosine") >= 0.4)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** q25: brute-force cosine top-5 neighbors for query vectors
    * (vec_id < 5) against the rest of the corpus. The query set is
    * broadcast; every corpus partition scores locally and keeps a
    * bounded top-k buffer ([[graft.functions.TopKAgg]]) — the shuffle
    * moves ≤ k rows per (partition × query), never the scored corpus
    * (a window-rank formulation would shuffle every scored row). */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopK
    val q = quantized(s, dir)
    val queries = broadcast(q.filter(col("vec_id") < 5).toDF("query_id", "qv", "qn2"))
    val corpus = q.filter(col("vec_id") >= 5).toDF("neighbor_id", "cv", "cn2")
    corpus.join(queries, lit(true))
      .withColumn("cosine", cosineQ(col("qv"), col("cv"), col("qn2"), col("cn2")))
      .groupBy(col("query_id"))
      .agg(TopK.topk(5)(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("cosine"))
  }

  /** q37: per-label centroid sums — exact integer element-wise sums
    * of quantized vectors, emitted as (label, pos, sx) rows. The
    * posexplode→groupBy shape is the scalable centroid pattern: the
    * shuffle carries (label, pos) partial sums, never whole vectors;
    * this is the k-means/IVF training step at 100 TB. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"),
        transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n_vecs"))

  /** q38 (rows-only): IVF-style ANN — per-label centroids act as the
    * coarse quantizer (inverted file): every corpus vector is assigned
    * to its nearest centroid; a query probes only the `nprobe` nearest
    * centroid lists. At 100 TB the corpus is partitioned by centroid
    * id, so a probe touches nprobe/k of the data. Returns top-3
    * neighbors per query from the probed lists. */
  def ivfTopK(s: SparkSession, dir: String, nprobe: Int = 2): DataFrame = {
    val q = quantized(s, dir)
    // coarse quantizer: exact integer centroid sums per label (q37),
    // scaled to a mean vector in micro-units
    val cent = Tables.embeddings(s, dir)
      .select(col("label"),
        transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("nv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), (col("sx") / col("nv")).cast("long").as("cx")))),
        e => e.getField("cx")).as("cv"))
    val centN = broadcast(cent
      .withColumn("cn2", org.apache.spark.sql.graft.LongArrayDot.column(col("cv"), col("cv"))))
    // assign every vector to its nearest centroid (rank 1 by cosine)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("label"))
    val assigned = q.join(centN, lit(true))
      .withColumn("ccos", cosineQ(col("v"), col("cv"), col("n2"), col("cn2")))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("label").as("cell"))
    // queries probe their nprobe nearest cells
    val probes = q.filter(col("vec_id") < 5).toDF("query_id", "qv", "qn2")
      .join(centN, lit(true))
      .withColumn("ccos", cosineQ(col("qv"), col("cv"), col("qn2"), col("cn2")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("label"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn2"), col("label").as("cell"))
    // search only the probed cells
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    probes.join(assigned.filter(col("vec_id") >= 5), "cell")
      .withColumn("cosine", cosineQ(col("qv"), col("v"), col("qn2"), col("n2")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** q26 (rows-only): random-hyperplane LSH buckets — the ANN scale
    * path. Hyperplane p component i is a deterministic ±1 from
    * xxhash64(p,i); bucket = 8 sign bits. At 100 TB each probe visits
    * ~1/256 of the corpus instead of all of it. */
  def annLshBuckets(s: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val q = quantized(s, dir)
    val planeBits = (0 until 8).map { p =>
      // deterministic ±1 hyperplane as a literal vector — the dot
      // against it runs through the codegen LongArrayDot
      val plane = (0 until dim).map(i =>
        if (scala.util.hashing.MurmurHash3.productHash((p, i)) % 2 == 0) 1L else -1L)
      val signedSum = org.apache.spark.sql.graft.LongArrayDot.column(
        col("v"), lit(plane.toArray))
      when(signedSum > 0, lit(1L << p)).otherwise(lit(0L))
    }
    val bucket = planeBits.reduce(_ + _)
    val withBucket = q.select(col("vec_id"), bucket.as("bucket"))
    val sizes = withBucket.groupBy(col("bucket")).agg(count(lit(1)).as("bucket_size"))
    withBucket.join(sizes, "bucket")
      .select(col("vec_id"), col("bucket"), col("bucket_size"))
  }
}
