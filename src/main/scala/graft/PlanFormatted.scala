package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for declared queries to files — the
  * optimization rounds' before/after plan evidence
  * (plans/r<N>/<query>_<tag>.txt).
  * Usage: runMain graft.PlanFormatted <outDir> <tag> <query> [query...] */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    val (outDir, tag, names) = (args(0), args(1), args.drop(2))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name.takeWhile(_ != '_')}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${name.takeWhile(_ != '_')}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
