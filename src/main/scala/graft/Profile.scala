package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.operators.Events.latestState(spark, dir).count() // warm-up
    for (n <- Seq("q12_latest_state","q21_dedup_ngram_jaccard","q22_dedup_minhash")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    graft.operators.Events.latestState(spark, dir).explain("formatted")
    spark.stop()
  }
}
