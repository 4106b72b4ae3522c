package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key
  private lazy val large = spark.range(0, 20000)
    .select(when($"id" % 10 < 9, "hot").otherwise(concat(lit("k"), $"id" % 50)).as("key"),
      $"id".as("payload"))
  private lazy val small = (Seq("hot") ++ (0 until 50).map("k" + _))
    .toDF("key").withColumn("dim_val", length($"key"))

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = large.join(small, Seq("key"))
      .select($"key", $"payload", $"dim_val")
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)
      .select($"key", $"payload", $"dim_val")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salting spreads the hot key across partitions") {
    val rep = Skew.keySpread(large, "key", numPartitions = 16, saltFactor = 8)
      .collect().map(r => r.getAs[String]("mode") -> r.getAs[Long]("max_rows")).toMap
    val total = 20000.0
    assert(rep("plain") >= total * 0.8, s"hot key should dominate one partition: $rep")
    assert(rep("salted_x8") <= total * 0.35, s"salting should spread it: $rep")
  }

  test("left joins preserve unmatched rows under salting") {
    val missing = large.limit(100).withColumn("key", lit("nowhere"))
    val all = large.unionByName(missing)
    val salted = Skew.saltedJoin(all, small, "key", 4, "left")
    assert(salted.filter($"key" === "nowhere" && $"dim_val".isNull).count() == 100)
  }

  test("right/full outer join types are rejected (small-side replication would duplicate)") {
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(large, small, "key", 4, jt)
      }
    }
  }

  test("saltedSelfJoin: pathological hot group — kNN results identical, join key salted") {
    // 60% of the corpus relabeled into one hot group: the within-group
    // self-join would give that group an O(n_g²) task without the guard
    val emb = graft.sources.Tables(spark, sf("sf0.001"), "embeddings")
      .withColumn("label", when($"vec_id" % 5 =!= 0, lit(99)).otherwise($"label"))
      .cache()
    val plain = Knn.exactWithin(emb, "label", k = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val guarded = Knn.exactWithin(emb, "label", k = 3,
      saltGroupsAbove = 100, salts = 4)
    val got = guarded.as[(Long, Int, Long, Double)].collect().toSet
    assert(got == plain, "salting must not change a single (query, rk, neighbor, sim) row")
    // the hot group's pair stage must actually join on (key, salt)
    val p = guarded.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), "hot-group join must be salted:\n" + p)
  }

  test("saltedSelfJoin: pathThree verdicts unchanged under a chatty-device salt guard") {
    import graft.core.DetectionConfig
    val readings = graft.sources.IoTSimulator.readings(spark, nTicks = 60,
      injections = graft.sources.IoTSimulator.compressorFailure("RTU-001", 30, 50))
    val snaps = Snapshotter.snapshots(readings, dim = 16)
      .withColumn("c_anom", lit(false)).cache()
    val cfg = DetectionConfig.VectorSearch
    val plain = Detection.pathThree(snaps, cfg)
      .select($"device_id", $"snapshot_time", $"corpus_n", $"match_n", $"path3_triggered")
      .collect().toSet
    val guarded = Detection.pathThree(snaps, cfg, saltDevicesAbove = 10, salts = 4)
      .select($"device_id", $"snapshot_time", $"corpus_n", $"match_n", $"path3_triggered")
      .collect().toSet
    assert(guarded == plain)
  }

  test("skewAudit: hot keys ranked with share and uniform-relative heat") {
    // key a×6, b×2, null×1, c×1 → total 10, n_keys 4, uniform share 2.5
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("a"), Some("a"),
      Some("a"), Some("b"), Some("b"), None, Some("c")).toDF("k")
    val out = Skew.skewAudit(df, "k", topK = 3)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 6L, 600000L, 240L),      // 6/10, 6/2.5 = 2.4× uniform
      (2L, "b", 2L, 200000L, 80L),
      (3L, "<null>", 1L, 100000L, 40L))) // ties break on key_value asc
  }
}
