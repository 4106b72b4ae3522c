package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Z-order clustering: measured on real parquet output, not asserted from
  * theory. Per-file min/max footers are what the reader's row-group
  * skipping consults; we read them back via input_file_name() grouping.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables(spark, sf("sf0.01"), "events").cache()

  /** fraction of files a point-equality predicate on `c` can skip,
    * judged by per-file [min,max] containment. */
  private def skippable(path: String, c: String, points: Seq[Long]): Double = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("long")).as("mn"), max(col(c).cast("long")).as("mx"))
      .select($"mn", $"mx").as[(Long, Long)].collect()
    val fracs = points.map { p =>
      stats.count { case (mn, mx) => p < mn || p > mx }.toDouble / stats.length
    }
    fracs.sum / fracs.size
  }

  test("z-order keeps per-file stats narrow on BOTH columns; single sort only on one") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = events.select($"user_id", $"ts", $"value")
      .withColumn("ts_s", unix_timestamp($"ts"))
    try {
      val nFiles = 16
      Maintenance.writeZOrdered(df, s"$dir/z", Seq("user_id", "ts_s"), nFiles)
      // control: classic time-sorted layout
      df.withColumn("_k", $"ts_s")
        .repartitionByRange(nFiles, $"_k").sortWithinPartitions($"_k").drop("_k")
        .write.parquet(s"$dir/t")

      val users = df.select($"user_id").distinct()
        .orderBy($"user_id").limit(40).as[Long].collect().toSeq
      val tsPts = df.select($"ts_s").orderBy($"ts_s")
        .limit(1).as[Long].collect().toSeq ++
        Seq.tabulate(9)(i => df.stat.approxQuantile("ts_s", Array(i / 10.0 + 0.1), 0.01)(0).toLong)

      val zUser = skippable(s"$dir/z", "user_id", users)
      val zTs = skippable(s"$dir/z", "ts_s", tsPts)
      val tUser = skippable(s"$dir/t", "user_id", users)
      val tTs = skippable(s"$dir/t", "ts_s", tsPts)

      info(f"skip fraction: z(user)=$zUser%.2f z(ts)=$zTs%.2f  tsorted(user)=$tUser%.2f tsorted(ts)=$tTs%.2f")
      // time-sorted layout: perfect on ts, useless on user
      assert(tTs > 0.8, s"control sanity: ts-sort should skip on ts, got $tTs")
      assert(tUser < 0.2, s"control sanity: ts-sort can't skip on user, got $tUser")
      // z-order: substantial skipping on BOTH dimensions
      assert(zUser > 0.4, s"z-order should skip on user_id, got $zUser")
      assert(zTs > 0.4, s"z-order should skip on ts, got $zTs")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("empty input / all-null column: constant key, no NPE") {
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    try {
      val empty = events.filter(lit(false)).select($"user_id", $"value")
      Maintenance.writeZOrdered(empty, s"$dir/e", Seq("user_id", "value"), nFiles = 4)
      assert(spark.read.parquet(s"$dir/e").count() == 0)
      val nullCol = events.select($"user_id", lit(null).cast("double").as("v"))
      Maintenance.writeZOrdered(nullCol, s"$dir/n", Seq("user_id", "v"), nFiles = 4)
      assert(spark.read.parquet(s"$dir/n").count() == events.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("clustering is a pure layout change: same rows, same values") {
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString
    val df = events.select($"user_id", $"value")
    try {
      Maintenance.writeZOrdered(df, s"$dir/z", Seq("user_id", "value"), nFiles = 4)
      val back = spark.read.parquet(s"$dir/z")
      assert(back.count() == df.count())
      assert(back.select($"user_id", $"value").as[(Long, Double)].collect().sorted.toSeq ==
        df.select($"user_id", $"value").as[(Long, Double)].collect().sorted.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
