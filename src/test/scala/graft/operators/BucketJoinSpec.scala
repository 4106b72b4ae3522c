package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Plan-level proof of the bucketed co-located join: two tables bucketed
  * on the join key join with no Exchange (shuffle) at all — the write-once
  * shuffle amortization that makes repeated big-to-big joins viable at
  * 100 TB. */
class BucketJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equi-join of co-bucketed tables runs without any exchange") {
    val ev = Tables(spark, sf("sf0.001"), "events")
      .select($"event_id", $"user_id", $"value")
    val users = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))

    Maintenance.writeBucketed(ev, "ev_b", "user_id", 8)
    Maintenance.writeBucketed(users, "users_b", "user_id", 8)
    try {
      // disable auto-broadcast so a non-bucketed plan WOULD shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_b").join(spark.table("users_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(joined.count() == ev.count())

      // control: the same join over plain frames does shuffle
      val control = ev.join(users, "user_id")
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"),
        "control (unbucketed) join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS ev_b")
      spark.sql("DROP TABLE IF EXISTS users_b")
    }
  }
}
