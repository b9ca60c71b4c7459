package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for named queries to files
  * (round-17 deliverable: plans/r17/<query>_{before,after}.txt). A
  * streaming gate's function RUNS its stream and returns the final
  * batch frame, so for those the captured plan is the post-stream
  * read — stated in the file header so a reader isn't misled.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> <suffix> <name>...
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, s"${n}_$suffix.txt"),
        (s"== $n @ $dir (explain formatted) ==\n" + txt).getBytes("UTF-8"))
      org.apache.spark.sql.graft.StateStoreHooks.unloadAll()
      println(s"[explain] wrote $n")
    }
    spark.stop()
  }
}
