package graft
import org.apache.spark.sql.SparkSession
object Plan31 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q31_minhash_neardup")(spark, "/root/testdata/sf0.1")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    Seq("BroadcastNestedLoopJoin","CartesianProduct","SortMergeJoin","BroadcastHashJoin","ShuffledHashJoin")
      .foreach(j => println(j + "=" + j.r.findAllIn(p).size))
    spark.stop()
  }
}
