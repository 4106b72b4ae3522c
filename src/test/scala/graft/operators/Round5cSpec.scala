package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{normText, tokens}
import graft.sources.Tables

/** Round-5 third batch: triangle census, Benford audit, FD audit,
  * exact-vs-binned percentile error, MinHash calibration, dedup savings,
  * seasonal residuals.
  */
class Round5cSpec extends SparkSpec {
  import spark.implicits._

  // ---- Graph.triangleStats -------------------------------------------

  test("triangleStats counts a hand-built graph exactly") {
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 (no new triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = Graph.triangleStats(edges, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") === 5)
    assert(r.getAs[Long]("n_edges") === 7)
    // degrees: 3,3,3,4,1 -> wedges = 3+3+3+6+0 = 15
    assert(r.getAs[Long]("n_wedges") === 15)
    assert(r.getAs[Long]("n_triangles") === 4)
    assert(r.getAs[Long]("global_cc_ppm") === 4L * 3 * 1000000 / 15)
  }

  test("degree-ordered triangle count equals the naive a<b<c join on a random graph") {
    val rnd = new Random(11)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val df = edges.toDF("a", "b")
    val fast = Graph.triangleStats(df, "a", "b").head().getAs[Long]("n_triangles")
    val set = edges.toSet
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val naive = (for {
      a <- vs; b <- vs if a < b && set((a, b))
      c <- vs if b < c && set((b, c)) && set((a, c))
    } yield 1).size.toLong
    assert(fast === naive)
  }

  test("labelPropagation separates two bridged cliques deterministically") {
    // K4 {1..4} + K4 {5..8} joined by the single bridge 4-5
    def k4(off: Long) = for { a <- 0L to 3L; b <- (a + 1) to 3L }
      yield (off + a, off + b)
    val edges = (k4(1) ++ k4(5) :+ (4L, 5L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", iters = 4)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    // clique A converges to min-id 1; clique B to min-id 5 (the bridge
    // pull of label 1/4 into node 5 is outvoted by its clique, rounds 2+)
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
    val again = Graph.labelPropagation(edges, "a", "b", iters = 4)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(again == out)
  }

  test("labelPropagation's deterministic-mode vote == the retired two-stage argmax") {
    // round 12 fused the per-round groupBy(v,lbl).count + max(struct(c,
    // -lbl)) into ONE mode(lbl, deterministic=true) aggregation; on a
    // tie-heavy random graph the full 4-round trajectory must match the
    // retired spelling label for label (ties -> smallest label)
    val rnd = new Random(7)
    val edges = (1 to 400)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    val e = edges.select(col("a").cast("bigint").as("a"), col("b").cast("bigint").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = e.select(col("a").as("s"), col("b").as("d"))
      .unionAll(e.select(col("b").as("s"), col("a").as("d"))).localCheckpoint(true)
    var lbl = sym.select(col("s").as("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint(true)
    for (_ <- 1 to 4) { // the retired spelling, verbatim
      lbl = sym.join(lbl.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("d").as("v"), col("lbl"))
        .unionAll(lbl)
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(true)
    }
    val retired = lbl.orderBy($"v").as[(Long, Long)].collect().toSeq
    val fused = Graph.labelPropagation(edges, "a", "b", iters = 4)
      .orderBy($"v").as[(Long, Long)].collect().toSeq
    assert(fused == retired)
  }

  test("kCore driver-local peel == distributed peel (edges and rounds)") {
    // round 12: driver-sized graphs are peeled locally; survivors AND
    // the round count must match the distributed loop. K5 core survives
    // 3-core peeling; the pendant chain hanging off it peels away over
    // several rounds (the multi-round geometry).
    val k5 = for { a <- 0L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val chain = (0 until 6).map(i => (10L + i, 11L + i)) :+ (4L, 10L)
    val edges = (k5 ++ chain).toDF("a", "b")
    val (coreL, roundsL) = Graph.kCoreCounted(edges, "a", "b", k = 3)
    val (coreD, roundsD) = Graph.kCoreCounted(edges, "a", "b", k = 3,
      driverMaxEdges = 0)
    val l = coreL.as[(Long, Long)].collect().toSet
    val d = coreD.as[(Long, Long)].collect().toSet
    assert(l == d && l == k5.toSet, s"local $l vs dist $d")
    assert(roundsL == roundsD, s"rounds $roundsL vs $roundsD")
    // empty-core geometry too (everything peels away)
    val path = (0L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("a", "b")
    val (pl, prl) = Graph.kCoreCounted(path, "a", "b", k = 2)
    val (pd, prd) = Graph.kCoreCounted(path, "a", "b", k = 2, driverMaxEdges = 0)
    assert(pl.isEmpty && pd.isEmpty && prl == prd, s"$prl vs $prd")
  }

  // ---- Audit.benford --------------------------------------------------

  test("benford emits all 9 digits with exact counts and shares") {
    // 1xxx appears 6x, 2xxx 3x, 9xx 1x; digits 3..8 absent
    val vals = Seq.fill(6)(1234L) ++ Seq.fill(3)(250L) ++ Seq(900L) ++ Seq(-5L, 0L)
    val df = vals.toDF("v")
    val rows = Audit.benford(df, col("v")).collect()
    assert(rows.length === 9)
    val byDigit = rows.map(r => r.getAs[Long]("digit") -> r).toMap
    assert(byDigit(1).getAs[Long]("n") === 6)
    assert(byDigit(2).getAs[Long]("n") === 3)
    assert(byDigit(9).getAs[Long]("n") === 1)
    assert(byDigit(3).getAs[Long]("n") === 0)
    assert(byDigit(1).getAs[Long]("share_ppm") === 600000L)
    assert(byDigit(3).getAs[Long]("dev_ppm") === 124939L) // |0 - expected|
    // expected shares sum to exactly 1e6
    assert(rows.map(_.getAs[Long]("expected_ppm")).sum === 1000000L)
  }

  test("benford on an input with no positive values yields deterministic zeros, not NULLs") {
    val df = Seq(-5L, 0L, -1L).toDF("v")
    val rows = Audit.benford(df, col("v")).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("share_ppm")))
      assert(!r.isNullAt(r.fieldIndex("dev_ppm")))
      assert(r.getAs[Long]("share_ppm") === 0L)
      assert(r.getAs[Long]("dev_ppm") === r.getAs[Long]("expected_ppm"))
    }
  }

  // ---- Audit.fdAudit --------------------------------------------------

  test("fdAudit on an empty table yields (0, 0, 0, holds=true), not NULLs") {
    val df = Seq.empty[(String, String)].toDF("k", "v")
    val r = Audit.fdAudit(df, "t", Seq(("k_v", Seq("k"), "v"))).head()
    assert(r.getAs[Long]("n_groups") === 0)
    assert(r.getAs[Long]("n_violating_groups") === 0)
    assert(r.getAs[Long]("n_ambiguous_rows") === 0)
    assert(r.getAs[Boolean]("holds"))
  }

  test("fdAudit separates holding from violated FDs with exact counts") {
    val df = Seq(
      ("k1", "x", 10), ("k1", "x", 11), // k1 -> x consistent (2 rows)
      ("k2", "y", 12),                  // k2 -> y consistent
      ("k3", "x", 13), ("k3", "z", 14), ("k3", "z", 15) // k3 ambiguous
    ).toDF("k", "v", "other")
    val out = Audit.fdAudit(df, "t", Seq(
      ("k_v", Seq("k"), "v"),
      ("k_other", Seq("k"), "other")))
      .collect().map(r => r.getAs[String]("fd") -> r).toMap
    val kv = out("t.k_v")
    assert(kv.getAs[Long]("n_groups") === 3)
    assert(kv.getAs[Long]("n_violating_groups") === 1)
    assert(kv.getAs[Long]("n_ambiguous_rows") === 3)
    assert(!kv.getAs[Boolean]("holds"))
    val ko = out("t.k_other")
    assert(ko.getAs[Long]("n_violating_groups") === 3 - 1) // k2 single-row
    assert(!ko.getAs[Boolean]("holds"))
  }

  // ---- Histogram.exactPercentiles vs binPercentiles -------------------

  test("exactPercentiles matches a sort-based computation; bin estimate within one bin") {
    val rnd = new Random(3)
    val rows = (1 to 5000).map(_ =>
      (if (rnd.nextBoolean()) "g1" else "g2", rnd.nextInt(100000).toLong))
    val df = rows.toDF("g", "v")
    val ppms = Seq(250000, 500000, 990000)
    val exact = Histogram.exactPercentiles(df, "g", "v", ppms)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val est = Histogram.binPercentiles(df, "g", "v", 1000.0, ppms)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("g1", "g2"); p <- ppms) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      val rank = math.ceil(vs.size.toDouble * p / 1e6).toInt
      val want = vs(rank - 1)
      val got = exact(g).getAs[Long](s"p_$p")
      assert(got === want, s"$g p$p exact")
      val e = est(g).getAs[Double](s"p_$p")
      assert(e <= want && want < e + 1000.0, s"$g p$p est=$e want=$want")
    }
  }

  // ---- Dedup.minhashCalibration ---------------------------------------

  test("minhashCalibration rows are internally consistent on sf0.001 documents") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val out = Dedup.minhashCalibration(docs, "doc_id", "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nm = r.getAs[Long]("n_match")
      // any candidate shares a full band = 2 consecutive slots
      assert(nm >= 2 && nm <= 8)
      assert(r.getAs[Long]("est_ppm") === nm * 125000)
      val (mn, mean, mx) = (r.getAs[Long]("min_exact_ppm"),
        r.getAs[Long]("mean_exact_ppm"), r.getAs[Long]("max_exact_ppm"))
      assert(mn <= mean && mean <= mx)
      assert(mn >= 0 && mx <= 1000000)
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    // the calibration trend: full signature agreement means a much more
    // similar pair population than the minimum (one-band) agreement.
    // Strict per-level monotonicity does NOT hold at this corpus size —
    // low-agreement levels have few pairs and noisy means — so assert
    // the endpoints only.
    val byMatch = out.map(r =>
      r.getAs[Long]("n_match") -> r.getAs[Long]("mean_exact_ppm")).toMap
    val (lo, hi) = (byMatch.keys.min, byMatch.keys.max)
    assert(byMatch(hi) > byMatch(lo))
    if (hi == 8) assert(byMatch(8) >= 500000)
  }

  // ---- Dedup.dedupSavings ---------------------------------------------

  test("dedupSavings token masses are consistent and exact stage matches direct recompute") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val out = Dedup.dedupSavings(docs, "doc_id", "text", "source").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tot, ex, nd) = (r.getAs[Long]("tokens_total"),
        r.getAs[Long]("tokens_after_exact"), r.getAs[Long]("tokens_after_near"))
      assert(nd <= ex && ex <= tot)
      assert(r.getAs[Long]("saved_exact_ppm") === (tot - ex) * 1000000 / tot)
    }
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // direct recompute of the exact stage: per-source token mass of
    // min-id-per-canonical-text keepers
    val direct = docs
      .select($"doc_id", $"source", size(tokens($"text")).cast("long").as("n_tok"),
        md5(normText($"text")).as("ck"))
      .withColumn("keep", $"doc_id" === min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"ck")))
      .filter($"keep")
      .groupBy($"source").agg(sum($"n_tok").as("after_exact"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("after_exact")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("tokens_after_exact") === direct(r.getAs[String]("source")))
    }
  }

  // ---- Graph.kCore -----------------------------------------------------

  test("kCore matches a naive in-memory peel and is a fixpoint") {
    val rnd = new Random(19)
    val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val df = edges.toDF("a", "b")
    for (k <- Seq(2, 3, 5)) {
      val got = Graph.kCore(df, "a", "b", k)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      // naive peel
      var e = edges.toSet
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val bad = deg.filter(_._2 < k).keySet
        val next = e.filter(p => !bad(p._1) && !bad(p._2))
        changed = next != e
        e = next
      }
      assert(got === e, s"k=$k")
      // fixpoint: every surviving vertex has degree >= k
      val deg = got.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(deg.values.forall(_ >= k), s"k=$k fixpoint")
    }
  }

  test("sf0.01 co-purchase 3-core peel converges within the oracle's 10 unrolled rounds") {
    // the q203 oracle unrolls exactly 10 peel rounds; if the real data
    // ever needs more, the oracle under-peels and the driver gate fails —
    // this asserts the margin holds where the driver runs (sf0.01)
    val li = Tables(spark, sf("sf0.01"), "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val edges = li.as("x").join(li.as("y"),
        $"x.l_orderkey" === $"y.l_orderkey" && $"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("pa"), $"y.l_partkey".as("pb"))
      .agg(count(lit(1)).as("n_ab")).filter($"n_ab" >= 2)
      .select($"pa", $"pb").collect().map(r => (r.getLong(0), r.getLong(1)))
    var e = edges.toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val next = e.filter(p => deg(p._1) >= 3 && deg(p._2) >= 3)
      changed = next != e
      if (changed) rounds += 1
      e = next
    }
    assert(rounds <= 10, s"peel took $rounds rounds; raise the oracle unroll")
  }

  // ---- RRF fusion -------------------------------------------------------

  test("RRF weights and ordering follow the 1e6 div (60+rank) contract") {
    val out = graft.SparkEntry.queries("q204_rrf_fusion")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val (ra, rb, w) = (r.getAs[Long]("rank_bm25"), r.getAs[Long]("rank_tf"),
        r.getAs[Long]("rrf_ppm"))
      val want = (if (ra > 0) 1000000L / (60 + ra) else 0L) +
        (if (rb > 0) 1000000L / (60 + rb) else 0L)
      assert(w === want)
      assert(ra >= 0 && ra <= 30 && rb >= 0 && rb <= 30)
      assert(ra > 0 || rb > 0)
    }
    // descending fused score
    val ws = out.map(_.getAs[Long]("rrf_ppm"))
    assert(ws.zip(ws.tail).forall { case (x, y) => x >= y })
  }

  // ---- Dedup.thresholdSweep --------------------------------------------

  test("thresholdSweep counts are monotone and agree with nearDupPairs at 0.5") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val row = Dedup.thresholdSweep(docs, "doc_id", "text").head()
    val counts = Seq("n_ge_30", "n_ge_50", "n_ge_70", "n_ge_80", "n_ge_90")
      .map(row.getAs[Long])
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(row.getAs[Long]("n_candidates") >= counts.head)
    val pairs05 = Dedup.nearDupPairs(docs, "doc_id", "text").count()
    assert(counts(1) === pairs05)
  }

  // ---- Dedup.goldenRecord ----------------------------------------------

  test("goldenRecord majority votes and survivor picks match a direct recompute") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val out = Dedup.goldenRecord(docs, "doc_id", "text",
      Seq("lang", "source"), "n_chars").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_members") >= 2))
    // recompute from the component labels + raw fields
    val comps = Dedup.nearDupGroups(
        Dedup.nearDupPairs(docs, "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_id")).toMap
    val fields = docs.select($"doc_id", $"lang", $"source", $"n_chars")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toMap
    val byComp = comps.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    out.foreach { r =>
      val comp = r.getAs[Long]("comp")
      val members = byComp(comp)
      assert(r.getAs[Long]("n_members") === members.size)
      def majority(f: Long => String): String =
        members.groupBy(f).toSeq
          .minBy { case (v, ms) => (-ms.size, v) }._1
      assert(r.getAs[String]("lang") === majority(id => fields(id)._1))
      assert(r.getAs[String]("source") === majority(id => fields(id)._2))
      val longest = members.minBy(id => (-fields(id)._3, id))
      assert(r.getAs[Long]("longest_doc_id") === longest)
      assert(r.getAs[Long]("max_len") === members.map(fields(_)._3).max)
    }
  }

  // ---- Skyline ----------------------------------------------------------

  test("skyline2d equals the naive dominance filter and is a strict staircase") {
    val rnd = new Random(23)
    val pts = (1 to 2000).map(_ => (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val out = Skyline.skyline2d(pts.toDF("x", "y"), "x", "y").collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("n_rows")))
    val naive = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (x2, y2) => x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }
    assert(out.map(p => (p._1, p._2)).toSet === naive.toSet)
    out.foreach { case (x, y, n) =>
      assert(n === pts.count(_ == ((x, y))).toLong)
    }
    val sorted = out.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case (a, b) =>
      a._1 < b._1 && a._2 < b._2
    })
  }

  // ---- blocking quality --------------------------------------------------

  test("blocking-quality audit invariants hold on sf0.001 parts") {
    val r = graft.SparkEntry.queries("q210_blocking_quality")(spark, sf("sf0.001"))
      .head()
    val (full, blocked) = (r.getAs[Long]("n_comparisons_full"),
      r.getAs[Long]("n_comparisons_blocked"))
    assert(blocked <= full && full > 0)
    assert(r.getAs[Long]("n_blocked_true") <= r.getAs[Long]("n_true_pairs"))
    assert(r.getAs[Long]("reduction_ppm") === (full - blocked) * 1000000 / full)
    val pc = r.getAs[Long]("pair_completeness_ppm")
    assert(pc >= 0 && pc <= 1000000)
  }

  // ---- session dwell ----------------------------------------------------

  test("session dwell excludes cross-session gaps and folds exact micros") {
    val rows = Seq(
      // user 1: view at t0, purchase 90s later, then a 2h break, view
      ("2024-01-01 10:00:00", 1L, 1L, "view"),
      ("2024-01-01 10:01:30", 2L, 1L, "purchase"),
      ("2024-01-01 12:10:00", 3L, 1L, "view"),
      // user 2: two views 10s apart
      ("2024-01-01 09:00:00", 4L, 2L, "view"),
      ("2024-01-01 09:00:10", 5L, 2L, "view"))
      .toDF("ts_s", "event_id", "user_id", "event_type")
      .select(to_timestamp($"ts_s").as("ts"), $"event_id", $"user_id",
        $"event_type", lit(0.0).as("value"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("dwell").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("q207_session_dwell")(spark, tmp)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    // view->purchase 90s (user1) and view->view 10s (user2) survive; the
    // 2h09m gap is cross-session and must be dropped
    assert(out.keySet === Set("view"))
    assert(out("view").getAs[Long]("n_dwells") === 2)
    assert(out("view").getAs[Long]("mean_dwell_ms") === (90000L + 10000L) / 2)
    assert(out("view").getAs[Long]("max_dwell_ms") === 90000L)
  }

  // ---- activity Gini (q220 algebra) ------------------------------------

  test("Gini closed-form tie blocks equal the naive sorted-rank formula") {
    val rnd = new Random(31)
    val counts = (1 to 500).map(_ => 1L + rnd.nextInt(20))
    val xs = counts.sorted
    val (n, tot) = (xs.size.toLong, xs.sum)
    val rx = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val want = (2 * rx - (n + 1) * tot) * 1000000 / (n * tot)
    // same computation as q220, over the value-count table
    import org.apache.spark.sql.expressions.Window
    val vc = counts.toDF("c").groupBy($"c").agg(count(lit(1)).as("m"))
    val byC = Window.orderBy($"c").rowsBetween(Window.unboundedPreceding, -1)
    val got = vc.withColumn("cum_before",
        coalesce(sum($"m").over(byC), lit(0L)))
      .agg(sum($"m").as("n"), sum($"c" * $"m").as("t"),
        sum($"c" * ($"m" * $"cum_before" * 2 + $"m" * ($"m" + 1))).as("rx2"))
      .select(expr("(rx2 - (n + 1) * t) * 1000000 div (n * t)"))
      .head().getLong(0)
    assert(got === want)
  }

  // ---- Timeseries.seasonalResiduals -----------------------------------

  test("seasonalResiduals surfaces an injected burst with the exact ppm") {
    // 3 weeks of Mondays at 10:00 with 10 events each, plus one Monday
    // 10:00 with 40 events -> that slot's residual tops the list
    val base = for {
      week <- 0 until 3
      i <- 0 until 10
    } yield (s"2024-01-${String.format("%02d", Integer.valueOf(1 + 7 * week))} 10:00:0${i % 10}", week * 100 + i)
    val burst = (0 until 40).map(i => (f"2024-01-22 10:${i % 60}%02d:00", 1000 + i))
    val df = (base ++ burst)
      .toDF("ts_s", "event_id")
      .select(to_timestamp($"ts_s").as("ts"), $"event_id")
    val out = Timeseries.seasonalResiduals(df, $"ts", topN = 5).collect()
    val top = out.head
    assert(top.getAs[String]("slot") === "2024-01-22 10")
    // total = 70 over 4 slots; burst slot: 40*4 - 70 = 90 -> 90*1e6/70
    assert(top.getAs[Long]("residual_ppm") === 90L * 1000000 / 70)
    // a baseline slot: 10*4 - 70 = -30 -> -(30*1e6/70)
    val baseRow = out.find(_.getAs[String]("slot") === "2024-01-01 10").get
    assert(baseRow.getAs[Long]("residual_ppm") === -(30L * 1000000 / 70))
  }
}
