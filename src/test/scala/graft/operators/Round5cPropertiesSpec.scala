package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the round-5c operators — the properties that
  * must hold on ANY input, complementing Round5cSpec's value checks.
  */
class Round5cPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def randomEdges(seed: Int, nV: Int, nE: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (1 to nE).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
  }

  // ---- k-core ----------------------------------------------------------

  test("kCore is idempotent and nested: (k+1)-core ⊆ k-core = kCore(kCore)") {
    val df = randomEdges(5, 50, 300).toDF("a", "b")
    def edgeSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    for (k <- Seq(2, 3)) {
      val core = Graph.kCore(df, "a", "b", k)
      val again = Graph.kCore(core, "a", "b", k)
      assert(edgeSet(again) === edgeSet(core), s"idempotence k=$k")
      val higher = Graph.kCore(df, "a", "b", k + 1)
      assert(edgeSet(higher).subsetOf(edgeSet(core)), s"nesting k=$k")
    }
  }

  // ---- triangles -------------------------------------------------------

  test("triangle census is invariant under vertex relabeling") {
    val edges = randomEdges(7, 40, 250)
    val perm = Random.shuffle((0L until 40L).toVector)
    val relabeled = edges
      .map { case (a, b) => (perm(a.toInt), perm(b.toInt)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    def stats(e: Seq[(Long, Long)]) =
      Graph.triangleStats(e.toDF("a", "b"), "a", "b")
        .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles")
        .head().toSeq
    assert(stats(edges) === stats(relabeled))
  }

  // ---- skyline ---------------------------------------------------------

  test("adding a strictly dominated point never changes the skyline") {
    val rnd = new Random(11)
    val pts = (1 to 500).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    def sky(ps: Seq[(Long, Long)]) =
      Skyline.skyline2d(ps.toDF("x", "y"), "x", "y")
        .select($"x", $"y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = sky(pts)
    // dominated: worse x AND worse y than some existing point
    val (sx, sy) = base.head
    val dominated = (sx + 5, sy - 5)
    assert(sky(pts :+ dominated) === base)
    // and every input point is dominated-or-on-skyline (soundness)
    val skySet = base
    pts.foreach { case (x, y) =>
      val onOrDominated = skySet.contains((x, y)) ||
        skySet.exists { case (sx2, sy2) =>
          sx2 <= x && sy2 >= y && (sx2 < x || sy2 > y) }
      assert(onOrDominated, s"($x, $y) neither on skyline nor dominated")
    }
  }

  // ---- Gini ------------------------------------------------------------

  test("Gini is 0 for equal counts and scale-invariant") {
    import org.apache.spark.sql.expressions.Window
    def gini(counts: Seq[Long]): Long = {
      val vc = counts.toDF("c").groupBy($"c").agg(count(lit(1)).as("m"))
      val byC = Window.orderBy($"c").rowsBetween(Window.unboundedPreceding, -1)
      vc.withColumn("cb", coalesce(sum($"m").over(byC), lit(0L)))
        .agg(sum($"m").as("n"), sum($"c" * $"m").as("t"),
          sum($"c" * ($"m" * $"cb" * 2 + $"m" * ($"m" + 1))).as("rx2"))
        .select(expr("(rx2 - (n + 1) * t) * 1000000 div (n * t)"))
        .head().getLong(0)
    }
    assert(gini(Seq.fill(100)(7L)) === 0L)
    val rnd = new Random(13)
    val xs = (1 to 200).map(_ => 1L + rnd.nextInt(50))
    assert(gini(xs) === gini(xs.map(_ * 10)))
  }

  // ---- q201 / q212 cross-consistency -----------------------------------

  test("the streaming seasonal monitor's batch rows contain q201's top-20 exactly") {
    val dir = sf("sf0.001")
    val all = graft.SparkEntry.queries("q212_streaming_seasonal_batch")(spark, dir)
      .collect().map(_.toSeq).toSet
    val top = graft.SparkEntry.queries("q201_seasonal_residual")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(top.subsetOf(all))
    assert(top.size === math.min(20, all.size))
  }

  // ---- golden-record determinism ---------------------------------------

  test("goldenRecord majority tie-break picks the smallest value deterministically") {
    // two near-identical docs (same shingles) with different lang values:
    // a 1-1 vote tie must resolve to the lexicographically smaller lang
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, text, "zz", "s1", 60L),
      (2L, text + " extra", "aa", "s2", 66L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.goldenRecord(docs, "doc_id", "text",
      Seq("lang", "source"), "n_chars").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("lang") === "aa")
    assert(out.head.getAs[String]("source") === "s1")
    assert(out.head.getAs[Long]("longest_doc_id") === 2L)
  }

  // ---- seasonal residuals ----------------------------------------------

  test("per-(dow, hr) weighted residual mass is exactly zero") {
    // Σ over a slot group of (n·n_slots − total) = n_slots·total − n_slots·total = 0,
    // so the signed pre-division residuals cancel exactly within each group
    val rnd = new Random(17)
    val events = (1 to 2000).map { i =>
      val day = 1 + rnd.nextInt(21)
      val hr = rnd.nextInt(24)
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:${rnd.nextInt(60)}%02d:00"), i.toLong)
    }.toDF("ts", "event_id")
    val slots = events.groupBy(date_trunc("hour", $"ts").as("slot"))
      .agg(count(lit(1)).as("n"))
      .select($"slot", $"n", dayofweek($"slot").as("dow"), hour($"slot").as("hr"))
    val base = slots.groupBy($"dow", $"hr")
      .agg(sum($"n").as("total"), count(lit(1)).as("n_slots"))
    val mass = slots.join(base, Seq("dow", "hr"))
      .groupBy($"dow", $"hr")
      .agg(sum($"n" * $"n_slots" - $"total").as("signed_mass"))
      .agg(sum(abs($"signed_mass"))).head().getLong(0)
    assert(mass === 0L)
  }
}
