package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Contract of [[Dedup.incrementalSemanticDupes]] — the ingest-time
  * SemDeDup probe: verdicts against a STORED index equal a brute-force
  * same-cell recompute, the hamming prefilter never changes the result,
  * an empty index declares everything novel, and the probe applied per
  * micro-batch (foreachBatch, the production landing pattern) yields the
  * batch verdicts row for row. */
class IncrementalSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def unitV(xs: Double*): Seq[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat)
  }

  // ids 0/1 are the Lloyd seeds (lowest ids), so the two cells split
  // x-ish vs z-ish and membership is deterministic: cell(0) = {0, 2},
  // cell(1) = {1, 3}
  private lazy val indexed = Seq(
    (0L, unitV(1.0, 0.0, 0.0, 0.0)),
    (1L, unitV(0.0, 0.0, 1.0, 0.0)),
    (2L, unitV(0.98, 0.2, 0.0, 0.0)),
    (3L, unitV(0.0, 0.0, 0.9, 0.436)),
  ).toDF("vec_id", "embedding")
  private lazy val index = Ivf.buildPortable(indexed, nCells = 2, iters = 2)

  private lazy val delta = Seq(
    (10L, unitV(0.99, 0.15, 0.0, 0.0)), // x-cloud: dup of 2 (closest), not 0
    (11L, unitV(0.0, 1.0, 0.0, 0.0)),   // y-axis: novel everywhere
    (12L, unitV(0.0, 0.0, 0.9, 0.436)), // exact copy of 3 under a new id
    (3L, unitV(0.0, 0.0, 0.9, 0.436)),  // re-ingest: must not match itself
  ).toDF("vec_id", "embedding")

  test("verdicts match the brute-force same-cell recompute") {
    val out = Dedup.incrementalSemanticDupes(index, delta, minCosine = 0.5)
      .select($"vec_id", $"dup_of", $"sim", $"is_novel")
      .as[(Long, Option[Long], Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    // brute force: same stored cells, max cosine >= 0.5, min-id ties
    val cells = Ivf.assignVectors(index, indexed)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    val dCells = Ivf.assignVectors(index, delta)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    val iv = indexed.as[(Long, Seq[Float])].collect().toMap
    val dv = delta.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expected = dv.toSeq.sortBy(_._1).map { case (did, dvec) =>
      val hits = iv.toSeq
        .filter { case (cid, _) => cid != did && cells(cid) == dCells(did) }
        .map { case (cid, cvec) => (cid, cos(dvec, cvec)) }
        .filter(_._2 >= 0.5)
      if (hits.isEmpty) (did, None, None, true)
      else {
        val (cid, s) = hits.minBy { case (cid, s) => (-s, cid) }
        (did, Some(cid), Some(BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble), false)
      }
    }
    assert(out == expected, s"\n got $out\n exp $expected")
    // the semantics the fixture was built to pin
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(10L)._2.contains(2L)) // closest wins, not the seed
    assert(byId(11L)._4)              // novel
    assert(byId(12L)._2.contains(3L) && byId(12L)._3.contains(1.0))
    assert(byId(3L)._2.exists(_ != 3L)) // never its own duplicate
  }

  test("hamming prefilter never changes the verdict") {
    def run(pf: Boolean) =
      Dedup.incrementalSemanticDupes(index, delta, minCosine = 0.5,
          prefilter = pf)
        .orderBy($"vec_id")
        .as[(Long, Int, Option[Long], Option[Double], Boolean)]
        .collect().toSeq
    assert(run(true) == run(false))
  }

  test("empty index declares every delta vector novel, not throw") {
    val vSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], vSchema)
    val idx = Ivf.IvfIndex(
      cells = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("cell_id", IntegerType),
          StructField("centroid", ArrayType(DoubleType))))),
      assigned = empty.withColumn("cell_id", lit(0)))
    val out = Dedup.incrementalSemanticDupes(idx, delta)
      .select($"is_novel").as[Boolean].collect()
    assert(out.length == 4 && out.forall(identity))
  }

  test("per-micro-batch probe (foreachBatch) equals the batch verdicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val batch = Dedup.incrementalSemanticDupes(index, delta, minCosine = 0.5)
      .as[(Long, Int, Option[Long], Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    val rows = delta.as[(Long, Seq[Float])].collect().toSeq
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Option[Long], Option[Double], Boolean)]
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= Dedup.incrementalSemanticDupes(index, b.toDF(), minCosine = 0.5)
          .as[(Long, Int, Option[Long], Option[Double], Boolean)]
          .collect()
        ()
      }
      .start()
    try {
      mem.addData(rows.take(2)); q.processAllAvailable()
      mem.addData(rows.drop(2)); q.processAllAvailable()
    } finally q.stop()
    assert(got.sortBy(_._1).toSeq == batch)
  }
}
