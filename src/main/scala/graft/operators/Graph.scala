package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics over an edge list (OLAP / data-quality
  * extension; the reference has no graphs — SURVEY §1.1 — but near-dup
  * pair sets and co-purchase affinities ARE graphs, and their clustering
  * structure is a first-class corpus-quality signal).
  *
  * Triangle counting uses the degree-ordered orientation (Cohen 2009 /
  * Suri-Vassilvitskii "MapReduce triangle counting"): every undirected
  * edge is directed from its lower endpoint to its higher endpoint under
  * the total order (degree, id). Out-degrees under this orientation are
  * O(√m), so the wedge join — the only super-linear stage — is bounded by
  * Σ outdeg² = O(m^1.5) even on power-law graphs where the naive
  * adjacency self-join explodes on hub vertices. Each triangle is
  * produced exactly once (its vertices form a unique ordered chain), so
  * no post-hoc division and no double counting.
  */
object Graph {

  /** Global triangle census of an undirected simple graph. `edges` must
    * hold one row per undirected edge with `aCol < bCol` (canonical
    * form); self-loops and duplicates are dropped defensively.
    *
    * Output (one row): n_nodes, n_edges, n_wedges (= Σ C(deg,2), paths
    * of length 2 through each vertex), n_triangles, and the global
    * clustering coefficient 3·triangles/wedges in ppm — integer-exact.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(col(aCol).cast("bigint").as("a"), col(bCol).cast("bigint").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // Orient by (deg, id): the join keys are vertex ids, so both lookups
    // are plain equi-joins (broadcast or shuffle per AQE).
    val dir = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // Wedge generation on the SMALL-side vertex (bounded out-degree),
    // closed by an equi-semi-join against the directed edge set.
    val tri = dir.as("uv")
      .join(dir.as("vw"), col("uv.dst") === col("vw.src"))
      .select(col("uv.src").as("u"), col("uv.dst").as("v"),
        col("vw.dst").as("w"))
      .join(dir.select(col("src").as("u"), col("dst").as("w")),
        Seq("u", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val counts = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges")))
      .crossJoin(tri)
    counts.select(col("n_nodes"), col("n_edges"), col("n_wedges"),
      col("n_triangles"),
      when(col("n_wedges") > 0,
        expr("n_triangles * 3 * 1000000 div n_wedges")).otherwise(0L)
        .as("global_cc_ppm"))
  }

  /** k-core: the maximal subgraph in which every vertex has degree >= k —
    * the standard "dense cluster vs stringy periphery" separator (a spam
    * farm or template family shows up as a high-k core of the near-dup /
    * co-purchase graph; pendant chains never do). Returns the surviving
    * canonical (a < b) edge set.
    *
    * Classic peeling, distributed: each round computes degrees (one
    * map-combined groupBy), drops edges touching a sub-k vertex (two
    * anti-joins), and stops at the fixpoint. Rounds are bounded by the
    * degeneracy ordering depth — single digits on real graphs — and each
    * round's work SHRINKS with the surviving edge set (localCheckpoint
    * truncates the growing lineage; the loop condition rides the
    * checkpoint's count, costing no extra job). */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxRounds: Int = 30): DataFrame =
    kCoreCounted(edges, aCol, bCol, k, maxRounds)._1

  /** [[kCore]] plus its peeling round count — the cluster-portable cost
    * number (each round is one job; per-job latency is what a busy
    * cluster multiplies). Published per scale tier in SCALE.md.
    *
    * Round 12: a DRIVER-SIZED graph (<= `driverMaxEdges`, the
    * bounded-collect discipline of the IVF centroids / CC union-find)
    * is collected and peeled locally — the distributed loop costs ~4
    * jobs per round and real peels run 5-10 rounds, all pure job
    * latency on a few thousand edges. Survivors and the round count are
    * identical by construction (same degree rule, same convergence
    * test); Round5cSpec pins local ≡ distributed. Larger graphs keep
    * the distributed peel unchanged (the 100 TB path). */
  private[graft] def kCoreCounted(edges: DataFrame, aCol: String,
      bCol: String, k: Int, maxRounds: Int = 30,
      driverMaxEdges: Int = 1 << 16): (DataFrame, Int) = {
    require(k >= 1, "k must be >= 1")
    var e = edges
      .select(col(aCol).cast("bigint").as("a"), col(bCol).cast("bigint").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = e.count()
    var round = 0
    if (nEdges > 0 && nEdges <= driverMaxEdges) {
      var cur = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      var convergedL = false
      while (!convergedL && round < maxRounds) {
        val deg = new java.util.HashMap[Long, Long]()
        cur.foreach { case (a, b) =>
          deg.merge(a, 1L, _ + _); deg.merge(b, 1L, _ + _)
        }
        val next = cur.filter { case (a, b) =>
          deg.getOrDefault(a, 0L) >= k && deg.getOrDefault(b, 0L) >= k }
        convergedL = next.length == cur.length
        cur = next
        round += 1
      }
      val out = if (cur.isEmpty) e.limit(0)
      else e.sparkSession.createDataFrame(cur.toSeq).toDF("a", "b")
      return (out, round)
    }
    var converged = nEdges == 0
    while (!converged && round < maxRounds) {
      val bad = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k)
        .select(col("v"))
      val next = e
        .join(bad.select(col("v").as("a")), Seq("a"), "left_anti")
        .join(bad.select(col("v").as("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges
      e = next
      nEdges = n
      round += 1
    }
    (e, round)
  }

  /** Synchronous label propagation communities — DENSITY structure where
    * connected components give only connectivity: every node starts as
    * its own label; each round it adopts the most frequent label among
    * its neighbors PLUS its own current label (the self-vote that damps
    * the classic bipartite flip-flop), ties to the smallest label. A
    * FIXED `iters` rounds (no convergence job) keeps the output a pure
    * function of the graph — deterministic and engine-reproducible, so
    * the oracle unrolls the identical rounds in SQL.
    *
    * Scale shape: per round, one equi-join of the symmetric edge list
    * against the label table (shuffle on node id) and ONE keyed
    * aggregation (deterministic mode — partial-merged object hash
    * aggregate, so the map side still combines); `localCheckpoint`
    * truncates the growing lineage. Returns (v, community). */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1)
    val e = edges
      .select(col(aCol).cast("bigint").as("a"), col(bCol).cast("bigint").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = e.select(col("a").as("s"), col("b").as("d"))
      .unionAll(e.select(col("b").as("s"), col("a").as("d")))
      .localCheckpoint(true)
    var lbl = sym.select(col("s").as("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      // argmax votes in ONE keyed aggregation (round 12): deterministic
      // mode == most frequent, ties to the SMALLEST label (Mode's
      // deterministic path maxBys (count, value-reversed)) — bit-equal
      // to the retired two-stage groupBy(v,lbl).count + max(struct(c,
      // -lbl)) spelling, which paid a second (v,lbl)-keyed Exchange per
      // round; Round5cSpec pins the full 4-round trajectory against the
      // retired spelling on a tie-heavy graph
      val next = sym.join(lbl.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("d").as("v"), col("lbl"))
        .unionAll(lbl)
        .groupBy(col("v"))
        .agg(mode(col("lbl"), deterministic = true).as("lbl"))
        .localCheckpoint(true)
      lbl = next
    }
    lbl.select(col("v"), col("lbl").as("community"))
  }
}
