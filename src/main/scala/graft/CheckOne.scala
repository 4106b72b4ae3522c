package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Dev-loop oracle check: dump one query's result + its oracle SQL. */
object CheckOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"/tmp/checkone/$name.parquet")
      SparkEntry.oracleSql.get(name).foreach(sql =>
        Files.write(Paths.get(s"/tmp/checkone/$name.sql"), sql.getBytes))
    }
    spark.stop()
  }
}
