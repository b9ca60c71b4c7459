package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY §2.F).
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * The container has no decode libs, so the decode itself is a
  * clearly-marked deterministic fake — but the Spark plumbing (binary
  * columns, schema, partition-iterator batch shape, typed Encoders)
  * is real and is exactly what a production decoder plugs into.
  */
object Multimodal {

  case class BlobRow(doc_id: Long, blob: Array[Byte])
  case class DecodedMeta(
      doc_id: Long, byte_len: Long, content_sha: String,
      width: Int, height: Int, n_frames: Int)

  /** q31: declarative metadata over binary columns — stays in
    * codegen, no decode needed. STUB dimensions: deterministic fakes
    * derived from the bytes (length mod, first 8 sha nibbles as an
    * int) — a real decoder would parse the container header here.
    * Every field is md5/sha/length math replayable by the oracle. */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("byte_len"),
        sha2(col("blob"), 256).as("content_sha"),
        (length(col("blob")) % 1920).cast("long").as("width"),
        (length(col("blob")) % 1080).cast("long").as("height"),
        (conv(substring(sha2(col("blob"), 256), 1, 8), 16, 10).cast("long") % 120)
          .as("n_frames"))

  /** q52: frame sampling — fixed-stride slices of the binary column,
    * one row per sampled frame with its digest (the video-keyframe /
    * audio-chunk extraction shape; substr on binary is codegen'd, the
    * explode parallelizes frames across the cluster). A real decoder
    * replaces the digest with pixels. Oracle-replayable because the
    * docs are ASCII (byte slices == char slices in DuckDB). */
  def frameSample(s: SparkSession, dir: String, frameBytes: Int = 64,
      maxFrames: Int = 8): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      // guard: Spark's sequence(0, -1) yields [0, -1], not [] — an
      // empty blob would emit phantom frames the oracle doesn't
      .filter(length(col("blob")) > 0)
      .withColumn("n_frames",
        least(ceil(length(col("blob")) / frameBytes.toDouble), lit(maxFrames.toLong)))
      .select(col("doc_id"), col("n_frames"),
        posexplode(expr(
          s"transform(sequence(0, CAST(n_frames AS INT) - 1), i -> " +
            s"sha2(substr(blob, i * $frameBytes + 1, $frameBytes), 256))"))
          .as(Seq("frame_idx", "frame_sha")))
      .select(col("doc_id"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"), col("frame_sha"))

  /** Partition-iterator decode path — the batch shape a native decoder
    * (libjpeg/ffmpeg via JNI, or an Arrow-batched python worker) needs:
    * one initialization per partition, streaming over rows. */
  def decodePartitions(s: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[BlobRow]
      .mapPartitions { rows =>
        // per-partition init happens HERE (decoder handle, model, ...)
        val decoder = new StubDecoder
        rows.map(r => decoder.decode(r))
      }
  }

  /** STUB: deterministic fake decoder — replace with a real codec. */
  final class StubDecoder extends Serializable {
    private val digest = java.security.MessageDigest.getInstance("SHA-256")
    def decode(r: BlobRow): DecodedMeta = {
      digest.reset()
      val sha = digest.digest(r.blob).map("%02x".format(_)).mkString
      val crc = new java.util.zip.CRC32()
      crc.update(r.blob)
      DecodedMeta(r.doc_id, r.blob.length.toLong, sha,
        r.blob.length % 1920, r.blob.length % 1080, (crc.getValue % 120).toInt)
    }
  }
}
