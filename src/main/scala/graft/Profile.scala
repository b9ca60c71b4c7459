package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: warm per-query timing + plan inspection (SURVEY §6). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    def run(n: String): Unit = SparkEntry.queries(n)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    names.foreach(run) // warm
    names.foreach { n =>
      val t0 = System.nanoTime()
      run(n)
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
