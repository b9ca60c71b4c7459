package graft

import graft.operators.StreamingOps
import graft.sources.{FileWalStream, GraftWalStream, KafkaWalStream, WalSource}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The WalStream transport seam: the same downstream pipeline
  * (materializer → final states) must be byte-identical across
  * transports, proving consumers are transport-agnostic. */
class WalStreamSpec extends SparkSpec {

  test("file and DSv2 transports produce identical final row states") {
    val stage = Files.createTempDirectory("graft_walstream").toString
    val puts = WalSource.eventsAsWal(spark, sfDir)
      .filter(col("cells")(0)("kind") === "put")
    WalSource.writeWal(puts, s"$stage/pq", batches = 4)
    WalSource.writeWalJson(puts, s"$stage/js", batches = 4)

    val viaFile = StreamingOps.finalStates(spark,
      FileWalStream(s"$stage/pq", maxFilesPerTrigger = 2),
      s"$stage/out_f", s"$stage/ckpt_f").collect().map(_.toString).sorted
    val viaDsv2 = StreamingOps.finalStates(spark,
      GraftWalStream(s"$stage/js", maxFilesPerTrigger = 2),
      s"$stage/out_d", s"$stage/ckpt_d").collect().map(_.toString).sorted

    assert(viaFile.nonEmpty)
    assert(viaFile.sameElements(viaDsv2))

    // and the state-store provider does not change results: the
    // RocksDB provider (production choice) must agree byte-for-byte
    val viaRocks = StreamingOps.finalStates(spark,
      GraftWalStream(s"$stage/js", maxFilesPerTrigger = 2),
      s"$stage/out_r", s"$stage/ckpt_r", rocksDB = true)
      .collect().map(_.toString).sorted
    assert(viaFile.sameElements(viaRocks))
  }

  test("kafka transport constructs with the same downstream schema contract") {
    // the connector jar is not in this container, so coverage stops at
    // the seam: the adapter exists, is a WalStream, and carries the
    // options a deploy needs
    val k = KafkaWalStream("broker:9092", "graft-wal-topic")
    assert(k.isInstanceOf[graft.sources.WalStream])
    assert(k.startingOffsets == "earliest")
  }
}
