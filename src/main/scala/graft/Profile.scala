package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: plan inspection for the scale review (SURVEY §6). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q06_selective_sum", "q04_region_sales", "q01_pricing_summary", "q21_dedup_ngram_jaccard")
    interesting.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
