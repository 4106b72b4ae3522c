package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.streaming.StreamingIvfIngest

/** Closes the round-10 evidence gap for the semantic incremental-dedup
  * path: q74's MinHash index has an append ≡ fresh-build proof
  * (IncrementalDedupSpec); this is the same symmetry for the EMBEDDING
  * index — growing the stored cell layout through the streaming append
  * path ([[graft.streaming.StreamingIvfIngest.ingest]]) leaves future
  * [[Dedup.incrementalSemanticDupes]] probes IDENTICAL to probes against
  * a batch-built index over the union UNDER THE SAME TRAINED CELLS.
  *
  * Same-cells is the only honest equivalence for a TRAINED index: a
  * fresh `buildPortable` on the union re-runs Lloyd over different data
  * and may move centroids — verdicts are declared relative to the STORED
  * partitioning (the standing ANN contract: cells age, retrain on
  * cadence, [[Dedup.semanticRecallAudit]] prices the drift). What ingest
  * must guarantee — and what this spec gates — is that the GROWTH path
  * adds zero further divergence: routing is the same pure assignment
  * map, the grown layout reads back byte-equivalent to batch-assigning
  * the union, and probe verdicts cannot tell the two histories apart.
  */
class IncrementalSemanticGrownIndexSpec extends SparkSpec {
  import spark.implicits._

  private case class Vec(vec_id: Long, embedding: Seq[Float])

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()

  private def probeSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"vec_id", $"cell_id", $"dup_of", round($"sim", 9).as("sim"),
        $"is_novel")
      .as[(Long, Int, Option[Long], Option[Double], Boolean)]
      .collect().toSet

  test("probes against the streaming-grown index equal probes against a batch union build") {
    val base = emb.filter($"vec_id" % 10 < 7)
    val delta1 = emb.filter($"vec_id" % 10 >= 7 && $"vec_id" % 10 < 9)
    val delta2 = emb.filter($"vec_id" % 10 >= 9)
    val dir = java.nio.file.Files.createTempDirectory("sem_grown").toString
    try {
      val idx = Ivf.buildPortable(base, nCells = 8, iters = 2)
      Ivf.writeIndex(idx, s"$dir/idx")

      // grow the STORED layout through the streaming append path
      val rows = delta1.select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect().map { case (i, e) => Vec(i, e) }
      val ms = MemoryStream[Vec](spark)
      ms.addData(rows: _*)
      StreamingIvfIngest.ingest(idx, ms.toDF(), s"$dir/idx", s"$dir/ckpt")
        .awaitTermination()
      val grown = Ivf.readIndex(spark, s"$dir/idx")

      // trained cells must be untouched by growth
      val cellsBefore = idx.cells.orderBy($"cell_id").collect().toSeq
      val cellsAfter = grown.cells.orderBy($"cell_id").collect().toSeq
      assert(cellsAfter == cellsBefore, "ingest must never move centroids")
      assert(grown.assigned.count() == base.count() + delta1.count())

      // reference: batch union under the SAME trained cells
      val unionIdx = Ivf.IvfIndex(
        cells = idx.cells,
        assigned = Ivf.assignVectors(idx, base.unionByName(delta1)))

      val got = probeSet(
        Dedup.incrementalSemanticDupes(grown, delta2, minCosine = 0.3))
      val want = probeSet(
        Dedup.incrementalSemanticDupes(unionIdx, delta2, minCosine = 0.3))
      assert(got == want,
        s"only-grown=${got -- want}\nonly-union=${want -- got}")
      // the fixture must actually exercise both verdicts
      assert(got.exists(!_._5) && got.exists(_._5),
        "fixture is vacuous: need both duplicate and novel verdicts")
      // and delta1 members must be probe-visible (growth really happened)
      val d1 = delta1.select($"vec_id").as[Long].collect().toSet
      assert(got.exists(_._3.exists(d1.contains)),
        "no verdict resolved to an ingested vector — growth untested")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("two-step growth: ingest(a) then ingest(b) equals one batch assignment of a ∪ b") {
    val base = emb.filter($"vec_id" % 10 < 6)
    val a = emb.filter($"vec_id" % 10 === 6)
    val b = emb.filter($"vec_id" % 10 >= 7 && $"vec_id" % 10 < 9)
    val delta = emb.filter($"vec_id" % 10 >= 9)
    val dir = java.nio.file.Files.createTempDirectory("sem_grown2").toString
    try {
      val idx = Ivf.buildPortable(base, nCells = 8, iters = 2)
      Ivf.writeIndex(idx, s"$dir/idx")
      def ingest(df: org.apache.spark.sql.DataFrame, ckpt: String): Unit = {
        val rows = df.select($"vec_id", $"embedding")
          .as[(Long, Seq[Float])].collect().map { case (i, e) => Vec(i, e) }
        val ms = MemoryStream[Vec](spark)
        ms.addData(rows: _*)
        StreamingIvfIngest.ingest(idx, ms.toDF(), s"$dir/idx", s"$dir/$ckpt")
          .awaitTermination()
      }
      ingest(a, "ck_a")
      ingest(b, "ck_b")
      val grown = Ivf.readIndex(spark, s"$dir/idx")
      val unionIdx = Ivf.IvfIndex(
        cells = idx.cells,
        assigned = Ivf.assignVectors(idx,
          base.unionByName(a).unionByName(b)))
      val got = probeSet(
        Dedup.incrementalSemanticDupes(grown, delta, minCosine = 0.3))
      val want = probeSet(
        Dedup.incrementalSemanticDupes(unionIdx, delta, minCosine = 0.3))
      assert(got == want)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
