package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.WalSource
import graft.streaming.RowMaterializer
import graft.model.Mutation
object StreamBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled","false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val walDir = java.nio.file.Files.createTempDirectory("graft_sb").toString
    val wal = WalSource.eventsAsWal(spark, dir)
    WalSource.writeWal(wal, walDir, batches = 16)
    val n = wal.count()
    val t0 = System.nanoTime()
    val muts = WalSource.stream(spark, walDir, maxFilesPerTrigger = 4).as[Mutation]
    val q = RowMaterializer.materialize(spark, muts)
      .writeStream.format("noop").outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val secs = (System.nanoTime()-t0)/1e9
    println(f"STREAM: $n mutations through stateful materializer in $secs%.1f s = ${n/secs}%.0f mut/s (RocksDB state)")
    spark.stop()
  }
}
