package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.GraftFunctions._

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k best scores, best first, across partitions") {
    val df = spark.range(0, 1000).repartition(8)
      .select($"id", (lit(1000.0) - $"id".cast("double")).as("score"))
    val top = df.groupBy(lit(1).as("g"))
      .agg(top_k_by_score($"score", $"id", 5).as("t"))
      .select(explode($"t").as("p"))
      .select($"p.id").as[Long].collect().toSeq
    assert(top == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("ties broken by lower id") {
    val df = Seq((1.0, 10L), (1.0, 2L), (1.0, 7L), (0.5, 1L)).toDF("score", "id")
      .repartition(3)
    val top = df.groupBy(lit(1).as("g"))
      .agg(top_k_by_score($"score", $"id", 3).as("t"))
      .select(explode($"t").as("p")).select($"p.id").as[Long].collect().toSeq
    assert(top == Seq(2L, 7L, 10L))
  }

  test("fewer rows than k returns all, sorted") {
    val df = Seq((0.1, 1L), (0.9, 2L)).toDF("score", "id")
    val top = df.groupBy(lit(1).as("g"))
      .agg(top_k_by_score($"score", $"id", 10).as("t"))
      .select(explode($"t").as("p")).select($"p.id").as[Long].collect().toSeq
    assert(top == Seq(2L, 1L))
  }

  test("TopKBuffer heap behaves under adversarial insertion order") {
    val buf = new TopKBuffer(4)
    val rnd = new scala.util.Random(3)
    val items = (0 until 200).map(i => (rnd.nextInt(50).toDouble, i.toLong))
    items.foreach { case (s, i) => buf.insert(s, i) }
    val expected = items.sortBy { case (s, i) => (-s, i) }.take(4)
    assert(buf.sorted.toSeq == expected)
  }
}
