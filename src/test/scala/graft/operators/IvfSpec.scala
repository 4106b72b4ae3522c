package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.001"), "embeddings").cache()

  test("build: every corpus vector lands in exactly one of k cells") {
    val idx = Ivf.build(emb, nCells = 8)
    assert(idx.cells.count() == 8)
    assert(idx.assigned.count() == emb.count())
    val cells = idx.assigned.select($"cell_id").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 8).toSet))
    // centroids have the corpus dimensionality
    assert(idx.cells.select(size($"centroid")).distinct().as[Int].head() == 64)
  }

  test("search: probing fewer cells trades recall for candidate pruning") {
    val idx = Ivf.build(emb, nCells = 8)
    val q = emb.filter($"vec_id" < 20)
    val exact = Knn.exact(emb, q, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

    def recallAt(nprobe: Int): Double = {
      val approx = Ivf.search(idx, q, k = 10, nprobe = nprobe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r2 = recallAt(2); val r8 = recallAt(8)
    assert(r8 >= 0.999, s"nprobe=k must be exhaustive, recall=$r8")
    assert(r2 >= 0.3, s"nprobe=2 recall too low: $r2")
    assert(r2 <= r8 + 1e-9)
  }


  test("stored index: search prunes cell partitions at the scan (100 TB path)") {
    val idx = Ivf.build(emb, nCells = 8)
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      Ivf.writeIndex(idx, path)
      val stored = Ivf.readIndex(spark, path)
      val q = emb.filter($"vec_id" < 5)
      val pruned = Ivf.searchPruned(stored, q, k = 5, nprobe = 2)
      pruned.collect() // finalize the adaptive plan
      // the probed cell set must reach the scan as a static partition
      // filter (PartitionFilters: [cell_id ... IN/EqualTo ...])
      val planStr = pruned.queryExecution.executedPlan.toString
      val hasPartFilter = "PartitionFilters: \\[cell_id".r
        .findFirstIn(planStr).isDefined
      assert(hasPartFilter, s"probed cells must prune the scan:\n$planStr")
      // results identical to the unpruned search over the same stored index
      val full = Ivf.search(stored, q, k = 5, nprobe = 2)
      assert(pruned.select($"query_id", $"rk", $"neighbor_id").collect().toSet ==
        full.select($"query_id", $"rk", $"neighbor_id").collect().toSet)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("sample-fit build (the 100 TB path): full assignment, exhaustive probe stays exact") {
    // train centroids on ~1/5 of the corpus, assign everything
    val idx = Ivf.build(emb, nCells = 8, maxFitRows = 100)
    assert(idx.assigned.count() == emb.count(), "every vector assigned")
    assert(idx.cells.count() == 8)
    // nprobe = nCells is exhaustive, so results equal exact kNN no matter
    // where the sampled centroids landed
    val q = emb.filter($"vec_id" < 10)
    val exact = Knn.exact(emb, q, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val viaIvf = Ivf.search(idx, q, k = 5, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaIvf == exact)
    // deterministic: same sample, same cells on rebuild
    val again = Ivf.build(emb, nCells = 8, maxFitRows = 100)
    assert(again.assigned.select($"vec_id", $"cell_id").collect().toSet ==
      idx.assigned.select($"vec_id", $"cell_id").collect().toSet)
  }

  test("portable build: zero-shuffle fold assignment equals the join+window argmin") {
    val idx = Ivf.buildPortable(emb, nCells = 8, iters = 2)
    assert(idx.assigned.count() == emb.count())
    // independent recomputation of the final assignment: micro-project,
    // cross-join the trained cells, windowed argmin (d2 asc, cell_id asc)
    val mv = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as double))").as("_mv"))
    val naive = mv.crossJoin(broadcast(idx.cells))
      .withColumn("_d2", expr(
        "aggregate(zip_with(_mv, centroid, (a, b) -> (a - b) * (a - b)), " +
          "cast(0.0 as double), (s, x) -> s + x)"))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"_d2".asc, $"cell_id".asc)))
      .filter($"_rn" === 1)
      .select($"vec_id", $"cell_id")
    assert(idx.assigned.select($"vec_id", $"cell_id").collect().toSet ==
      naive.collect().toSet)
    // and the assignment plan itself has no join and no window exchange
    val planStr = idx.assigned.queryExecution.executedPlan.toString
    assert(!planStr.contains("Join") && !planStr.contains("Window"),
      s"portable assignment must be a pure map:\n$planStr")
  }

  test("portable stored index: pruned portable search matches exhaustive, prunes the scan") {
    val idx = Ivf.buildPortable(emb, nCells = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfp_idx").toString
    try {
      Ivf.writeIndex(idx, path)
      val stored = Ivf.readIndex(spark, path)
      val q = emb.filter($"vec_id" < 5)
      val pruned = Ivf.searchPrunedPortable(stored, q, k = 5, nprobe = 8)
      pruned.collect()
      val planStr = pruned.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[cell_id".r.findFirstIn(planStr).isDefined,
        s"probed cells must prune the scan:\n$planStr")
      // nprobe = nCells is exhaustive ⇒ equals exact kNN
      val exact = Knn.exact(emb, q, k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      assert(pruned.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet == exact)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("search output follows the standard kNN contract") {
    val idx = Ivf.build(emb, nCells = 4)
    val out = Ivf.search(idx, emb.filter($"vec_id" < 3), k = 5, nprobe = 2)
    assert(out.count() == 15)
    assert(out.filter($"query_id" === $"neighbor_id").count() == 0)
    val rks = out.filter($"query_id" === 0).select($"rk").as[Int].collect().sorted.toSeq
    assert(rks == Seq(1, 2, 3, 4, 5))
  }

  test("graft_nearest_cell == retired nested-HOF assignment spelling") {
    // the round-12 native argmin must reproduce the retired
    // aggregate/transform/zip_with fold BIT-FOR-BIT: same left-to-right
    // double accumulation, strict < (first/lowest cid wins ties), null
    // element -> -1, dimension-mismatched cell never wins
    import org.apache.spark.sql.functions._
    val cs: Array[(Int, Seq[Double])] = Array(
      (0, Seq.fill(64)(0.0)), (1, Seq.fill(64)(1000.0)),
      (2, Seq.fill(64)(-500.0)), (3, Seq.fill(64)(0.0)), // duplicate of 0: tie -> 0
      (4, Seq.fill(32)(0.0))) // wrong dim: can never win
    val arr = array(cs.map { case (id, c) =>
      struct(lit(id).as("cid"), array(c.map(lit): _*).as("centroid")) }: _*)
    val old = emb
      .select($"vec_id", transform($"embedding".cast("array<double>"),
        x => floor(x * 1000000.0).cast("double")).as("_mv"))
      .withColumn("_cells", arr)
      .withColumn("cell_old", expr(
        """aggregate(
          |  transform(_cells, e -> struct(e.cid AS cid,
          |    aggregate(zip_with(_mv, e.centroid, (a, b) -> (a - b) * (a - b)),
          |      cast(0.0 AS double), (s, x) -> s + x) AS d)),
          |  struct(cast(-1 AS int) AS cid, cast('Infinity' AS double) AS d),
          |  (acc, e) -> IF(e.d < acc.d, e, acc)).cid""".stripMargin))
      .withColumn("cell_new", graft.internal.Bridge.column(
        graft.functions.NearestCell(
          graft.internal.Bridge.expression($"_mv"), cs.map(_._1), cs.map(_._2.toArray))))
    assert(old.filter(not($"cell_old" <=> $"cell_new")).isEmpty, "corpus parity")
    // null element and whole-null inputs -> -1 exactly as the fold
    val edge = Seq(Option(Seq(Option(1.0), None)), None, Option(Seq(Option(0.0), Option(0.0))))
      .toDF("_mv").select($"_mv".cast("array<double>").as("_mv"))
    val cs2: Array[(Int, Seq[Double])] = Array((7, Seq(0.0, 0.0)))
    val arr2 = array(cs2.map { case (id, c) =>
      struct(lit(id).as("cid"), array(c.map(lit): _*).as("centroid")) }: _*)
    val eo = edge.withColumn("_cells", arr2)
      .withColumn("cell_old", expr(
        """aggregate(
          |  transform(_cells, e -> struct(e.cid AS cid,
          |    aggregate(zip_with(_mv, e.centroid, (a, b) -> (a - b) * (a - b)),
          |      cast(0.0 AS double), (s, x) -> s + x) AS d)),
          |  struct(cast(-1 AS int) AS cid, cast('Infinity' AS double) AS d),
          |  (acc, e) -> IF(e.d < acc.d, e, acc)).cid""".stripMargin))
      .withColumn("cell_new", graft.internal.Bridge.column(
        graft.functions.NearestCell(
          graft.internal.Bridge.expression($"_mv"), cs2.map(_._1), cs2.map(_._2.toArray))))
      .select($"cell_old", $"cell_new").collect()
    eo.foreach(r => assert(r.get(0) == r.get(1), s"${r.get(0)} vs ${r.get(1)}"))
  }
}
