package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.IoTSimulator

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("graft_maint").toString

  // 3 days of data, 1 tick/hour → small but multi-partition
  private def table() = Snapshotter.snapshots(
    IoTSimulator.readings(spark, nTicks = 72, tickSeconds = 3600), dim = 8)

  test("retention drops whole partitions without rewriting survivors") {
    val dir = freshDir()
    Maintenance.writePartitioned(table(), dir)
    val before = spark.read.parquet(dir)
    assert(before.select($"date").distinct().count() == 3) // 72 hourly ticks
    val dropped = Maintenance.retainSince(spark, dir, "2024-01-02")
    assert(dropped == Seq("date=2024-01-01"))
    val after = spark.read.parquet(dir)
    assert(after.filter($"date" < "2024-01-02").count() == 0)
    assert(after.count() == before.filter($"date" >= "2024-01-02").count())
  }

  test("deleteWhere rewrites only affected partitions") {
    val dir = freshDir()
    Maintenance.writePartitioned(table(), dir)
    val before = spark.read.parquet(dir).count()
    val victims = spark.read.parquet(dir)
      .filter("device_id = 'RTU-001' AND date = '2024-01-02'").count()
    assert(victims > 0)
    Maintenance.deleteWhere(spark, dir,
      "device_id = 'RTU-001' AND date = '2024-01-02'")
    val after = spark.read.parquet(dir)
    assert(after.count() == before - victims)
    assert(after.filter("device_id = 'RTU-001' AND date = '2024-01-02'").count() == 0)
    // untouched partition still intact
    assert(after.filter($"date" === "2024-01-01").count() > 0)
  }

  test("compactPartition shrinks file count, preserves rows, leaves other partitions") {
    val dir = freshDir()
    // write deliberately fragmented (many shuffle partitions -> many files)
    Maintenance.writePartitioned(table().repartition(16), dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    def files(d: String) = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$d"))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    val before = spark.read.parquet(dir)
    val rowsBefore = before.count()
    val day1Before = before.filter($"date" === "2024-01-01").count()
    val day2Before = files("date=2024-01-02")
    assert(files("date=2024-01-01") > 2, "fixture should be fragmented")

    Maintenance.compactPartition(spark, dir, "2024-01-01", nFiles = 1)
    assert(files("date=2024-01-01") == 1, "compacted to one file")
    assert(files("date=2024-01-02") == day2Before, "other partitions untouched")
    val after = spark.read.parquet(dir)
    assert(after.count() == rowsBefore)
    assert(after.filter($"date" === "2024-01-01").count() == day1Before)
  }

  test("recentDeviceStates returns the newest snapshots fleet-wide (MV analog)") {
    val snaps = table()
    val got = Maintenance.recentDeviceStates(snaps, 10).collect()
    assert(got.length == 10)
    val times = got.map(_.getAs[java.sql.Timestamp]("snapshot_time").getTime)
    assert(times.sameElements(times.sorted(Ordering[Long].reverse)), "newest first")
    val cutoff = times.min
    val newerCount = snaps.filter($"snapshot_time" >
      new java.sql.Timestamp(cutoff)).count()
    assert(newerCount <= 10, "nothing newer was left out")
  }

  test("writeNdjson round-trips readings as line-delimited JSON") {
    val dir = freshDir() + "/ndjson"
    val readings = IoTSimulator.readings(spark, nTicks = 2)
    Maintenance.writeNdjson(readings, dir)
    val back = spark.read.json(dir)
    assert(back.count() == readings.count())
    assert(back.columns.toSet == readings.columns.toSet)
  }

  test("truncate removes the table") {
    val dir = freshDir()
    Maintenance.writePartitioned(table(), dir)
    Maintenance.truncate(spark, dir)
    assert(!new java.io.File(dir).exists())
  }
}
