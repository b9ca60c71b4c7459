package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSourceV2 **streaming source** for the graft WAL —
  * the direct Spark-native analogue of the reference's SEP consumer
  * (the north-star approach: consume the replication/event stream as
  * a Structured Streaming source).
  *
  * WAL layout: a directory of JSONL segment files (one mutation per
  * line, `WalSource.walSchema` fields). Offsets are segment counts
  * over the lexicographically-sorted file list — monotone, replayable
  * from any checkpoint (the at-least-once + idempotent-reprocessing
  * contract). Contract: writers must APPEND segments with
  * lexicographically increasing names (like WAL sequence files /
  * Kafka segment ids) so committed offsets keep addressing the same
  * prefix. `maxFilesPerTrigger` bounds each micro-batch; each
  * segment is one InputPartition so consumption parallelizes across
  * executors exactly like SEP shards events across consumers.
  *
  * Usage: `spark.readStream.format("graft-wal").load(dir)`.
  */
class WalDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wal"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalSource.walSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WalTable(properties.getOrDefault("path", properties.get("paths")))
}

private[sources] class WalTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-wal:$path"
  override def schema(): StructType = WalSource.walSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WalSource.walSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WalMicroBatchStream(
            Option(options.get("path")).getOrElse(path),
            options.getInt("maxFilesPerTrigger", 1))
      }
    }
}

/** Offset = count of WAL segment files consumed (sorted order). */
case class WalOffset(segments: Int) extends Offset {
  override def json(): String = segments.toString
}

private[sources] class WalMicroBatchStream(dir: String, maxFilesPerTrigger: Int)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def segments(): Array[String] = {
    // This source reads through java.io/java.nio, which silently
    // resolves non-local URIs against the local filesystem — fail
    // loudly instead of reporting an empty (= "no data") stream for
    // an hdfs:///s3a:// WAL or a missing directory.
    // only treat the string as a URI when it carries an explicit
    // "scheme://" prefix — a plain local path may contain URI-illegal
    // characters (spaces), and a relative path whose first segment
    // contains a colon ('wal:v2/segments') is a java.io.File path,
    // not a remote scheme
    val scheme =
      if (dir.matches("^[a-zA-Z][a-zA-Z0-9+.\\-]*://.*"))
        Some(dir.substring(0, dir.indexOf(':')))
      else None
    require(scheme.forall(_ == "file"),
      s"graft-wal reads local segment files; got scheme '${scheme.get}' for $dir — " +
        "plug a Hadoop FileSystem-backed reader for remote WALs")
    val d = new java.io.File(
      if (scheme.isDefined) java.nio.file.Paths.get(java.net.URI.create(dir)).toString else dir)
    require(d.isDirectory, s"graft-wal directory does not exist: $dir")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).sorted
  }

  /** Frozen segment count for Trigger.AvailableNow (process exactly
    * what existed at query start, then stop). */
  @volatile private var availableAtStart: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableAtStart = Some(segments().length)

  override def initialOffset(): Offset = WalOffset(0)
  override def deserializeOffset(json: String): Offset = WalOffset(json.trim.toInt)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(math.max(1, maxFilesPerTrigger))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val total = availableAtStart.getOrElse(segments().length)
    val s = start.asInstanceOf[WalOffset].segments
    // flatten composite limits (e.g. maxFiles composed with
    // minRows by the engine) and honor the tightest file bound;
    // any other limit kind falls back to the configured trigger cap
    def resolve(l: ReadLimit): Int = l match {
      case mf: ReadMaxFiles => math.min(total, s + mf.maxFiles())
      case _: ReadAllAvailable => total
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.map(resolve).min
      case _ => math.min(total, s + math.max(1, maxFilesPerTrigger))
    }
    WalOffset(math.max(s, resolve(limit)))
  }

  override def reportLatestOffset(): Offset = WalOffset(segments().length)
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WalOffset].segments
    val e = end.asInstanceOf[WalOffset].segments
    segments().slice(s, e).map(p => WalSegmentPartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WalReaderFactory
  override def stop(): Unit = ()
}

private[sources] case class WalSegmentPartition(path: String) extends InputPartition

private[sources] class WalReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WalSegmentReader(partition.asInstanceOf[WalSegmentPartition].path)
}

/** Streams one JSONL WAL segment into InternalRows. */
private[sources] class WalSegmentReader(path: String)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) { false }
    else {
      current = parse(mapper.readTree(it.next()))
      true
    }
  }

  private def utf8(n: JsonNode, field: String): AnyRef =
    if (n.hasNonNull(field)) UTF8String.fromString(n.get(field).asText()) else null

  private def parse(n: JsonNode): InternalRow = {
    val cellsNode = n.get("cells")
    val cells: ArrayData =
      if (cellsNode == null || cellsNode.isNull) null
      else {
        val arr = new Array[Any](cellsNode.size())
        var i = 0
        while (i < cellsNode.size()) {
          val c = cellsNode.get(i)
          arr(i) = new GenericInternalRow(Array[Any](
            utf8(c, "family"), utf8(c, "qualifier"), utf8(c, "value"),
            if (c.hasNonNull("ts")) c.get("ts").asLong() else null,
            utf8(c, "kind")))
          i += 1
        }
        new GenericArrayData(arr)
      }
    new GenericInternalRow(Array[Any](
      if (n.hasNonNull("seq")) n.get("seq").asLong() else null,
      if (n.hasNonNull("ts")) n.get("ts").asLong() else null,
      utf8(n, "table"), utf8(n, "rowkey"), cells))
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
