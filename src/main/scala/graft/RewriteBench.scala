package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object RewriteBench {
  def run(spark: SparkSession, label: String): Unit = {
    import spark.implicits._
    val narrow = spark.range(0, 20000000)
      .select(($"id" % 100000).as("g"), (($"id" * 2654435761L) % 1000000).cast("double").as("score"))
    bench(spark, label + " narrow", narrow)
    // kNN-shaped: wide array payload rides along (512B/row)
    val wide = spark.range(0, 2000000)
      .select(($"id" % 1000).as("g"), (($"id" * 2654435761L) % 1000000).cast("double").as("score"),
        expr("transform(sequence(1, 64), i -> cast(id * i as double))").as("vec"))
    bench(spark, label + " wide  ", wide)
  }
  def bench(spark: SparkSession, label: String, df: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val w = Window.partitionBy($"g").orderBy($"score".desc)
    val q = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
    q.count() // warm
    val t0 = System.nanoTime()
    val n = q.count()
    println(f"$label rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    def mk(ext: Boolean) = {
      val b = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false")
      (if (ext) b.withExtensions(new GraftExtensions) else b).getOrCreate()
    }
    val s1 = mk(false); s1.sparkContext.setLogLevel("ERROR"); run(s1, "WINDOW  "); s1.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = mk(true); s2.sparkContext.setLogLevel("ERROR"); run(s2, "REWRITTEN"); s2.stop()
  }
}
