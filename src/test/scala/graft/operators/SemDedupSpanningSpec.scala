package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract of `edgesMode = "spanning"` in
  * [[Dedup.semanticDedupExemplars]] — the output-bound-tier option: for
  * oversized cells the within-band all-pairs are replaced by per-band
  * stars (+ the cell-hub spokes), so edges per cell are linear in the
  * distinct count instead of size·cap/2.
  *
  * Gates, per the declared contract:
  *   - under-cap cells are IDENTICAL in both modes (the declared queries
  *     never activate the guard, so their hashes cannot move);
  *   - the centroid-owning tight block — the adversarial geometry the
  *     guard exists for — keeps GROUP PARITY with the all-pairs mode;
  *   - exact copies stay grouped in spanning mode (collapse edges bypass
  *     the pair stage entirely);
  *   - a SECONDARY tight block (owning neither the cell centroid nor a
  *     band hub) stays whole in both modes via the second-hub election
  *     over the provably-hub-1-dissimilar far set (round-12; formerly
  *     this spec asserted the fragmentation as the declared narrowing —
  *     the residual narrowing is now third-and-beyond blocks only).
  */
class SemDedupSpanningSpec extends SparkSpec {
  import spark.implicits._

  private def unitV(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }

  /** Tight near-dup block around direction `base`, |eps| ~ 5e-4. */
  private def jig(base: Seq[Double], i: Long): Array[Float] = {
    val e = base.indices.map(j => 0.0005 * ((i * base.size + j) % 7) - 0.0015)
    unitV(base.indices.map(j => base(j) + e(j)): _*)
  }

  private def run(vecs: org.apache.spark.sql.DataFrame, mode: String,
      cap: Int = 2, minCos: Double = 0.99) =
    Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = minCos,
        maxCellSize = cap, edgesMode = mode)
      .select($"vec_id", $"comp", $"is_kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq

  test("under-cap cells: spanning output is identical to all-pairs") {
    val vecs = (Seq(
      (0L, unitV(1.0, 0.0, 0.0, 0.0)),
      (1L, unitV(0.0, 1.0, 0.0, 0.0)),
      (2L, unitV(0.99, 0.14, 0.0, 0.0)),
      (3L, unitV(0.0, 0.0, 1.0, 0.0))) ++
      (4L until 8L).map(i => (i, jig(Seq(0.0, 0.2, 1.0, 0.1), i))))
      .toDF("vec_id", "embedding")
    // default cap: guard inactive, both modes must be byte-equal
    val all = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.9)
      .orderBy($"vec_id").collect().toSeq
    val span = Dedup.semanticDedupExemplars(vecs, nCells = 1, minCosine = 0.9,
        edgesMode = "spanning")
      .orderBy($"vec_id").collect().toSeq
    assert(span == all)
  }

  test("centroid-owning over-cap tight block: group parity with all-pairs mode") {
    // one cell = 2 outliers + a 10-member tight block that owns the
    // centroid; cap 2 forces banding. Spanning must report the same
    // groups as the all-pairs mode: the block is whole (both hub kinds
    // sit inside it), the outliers stay singletons.
    val vecs = (Seq(
      (0L, unitV(1.0, 0.0, 0.0, 0.0)),
      (1L, unitV(0.0, 1.0, 0.0, 0.0))) ++
      (2L until 12L).map(i => (i, jig(Seq(0.0, 0.2, 1.0, 0.1), i))))
      .toDF("vec_id", "embedding")
    val all = run(vecs, "all")
    val span = run(vecs, "spanning")
    assert(span.map(r => (r._1, r._2)) == all.map(r => (r._1, r._2)),
      s"\n all  $all\n span $span")
    val comp = span.map(r => r._1 -> r._2).toMap
    assert((2L until 12L).forall(comp(_) == 2L), s"block fragmented: $comp")
    assert(comp(0L) != 2L && comp(1L) != 2L)
    // election parity rides on group parity + identical centroid sims
    assert(span == all)
  }

  test("exact copies stay grouped in spanning mode (collapse edges bypass banding)") {
    val a = unitV(0.3, 0.2, 1.0, 0.1)
    val vecs = ((0L until 6L).map(i => (i, a)) ++
      (6L until 12L).map(i => (i, jig(Seq(1.0, 0.1, 0.0, 0.2), i))))
      .toDF("vec_id", "embedding")
    val span = run(vecs, "spanning")
    val comp = span.map(r => r._1 -> r._2).toMap
    assert((0L until 6L).forall(comp(_) == 0L), s"copies split: $comp")
  }

  test("property: spanning groups REFINE all-pairs groups on random geometries") {
    // the general invariant behind the fixed fixtures: spanning never
    // invents an edge, so any two ids co-grouped under spanning are
    // co-grouped under all-pairs — on ANY corpus, any banding, any cap.
    // Random unit vectors over a few base directions with per-id jitter
    // produce mixed cells: tight clusters, moderate clusters, outliers.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val bases = Vector(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.5, 0.5, 0.5, 0.5))
    val rowGen = Gen.zip(Gen.choose(0, bases.size - 1), Gen.choose(0, 6))
    val corpusGen = Gen.choose(8, 20).flatMap(n => Gen.listOfN(n, rowGen))
      .map(_.zipWithIndex.map { case ((b, amp), i) =>
        val base = bases(b)
        val e = base.indices.map(j => 0.003 * amp * (((i * 4 + j) % 7) - 3))
        (i.toLong, unitV(base.indices.map(j => base(j) + e(j)): _*))
      })
    val cases = (0 until 5).flatMap(i =>
      corpusGen(Gen.Parameters.default, Seed(2300L + i)))
    // Gen.apply returns Option and flatMap drops None — assert the draw
    // actually produced every case so the property can never pass vacuously
    assert(cases.size == 5, s"generator produced ${cases.size}/5 corpora")
    cases.foreach { corpus =>
      val vecs = corpus.toDF("vec_id", "embedding")
      val all = run(vecs, "all", cap = 3, minCos = 0.95)
      val span = run(vecs, "spanning", cap = 3, minCos = 0.95)
      val cAll = all.map(r => r._1 -> r._2).toMap
      val cSpan = span.map(r => r._1 -> r._2).toMap
      for (Seq(i, j) <- cAll.keys.toSeq.sorted.combinations(2))
        if (cSpan(i) == cSpan(j))
          assert(cAll(i) == cAll(j),
            s"spanning merged $i,$j that all-pairs separates; corpus size ${corpus.size}")
    }
  }

  test("second-hub election: a secondary tight block stays whole in BOTH modes") {
    // dominant 12-member block at direction A (owns the centroid) + a
    // 4-member tight block at orthogonal direction B. B's members own
    // neither the cell centroid nor (typically) a band hub, so before
    // the second-hub election banding could fragment B in either mode
    // (this test formerly ASSERTED that fragmentation as the declared
    // narrowing). Now: B's delegates are provably hub-1-dissimilar
    // (orthogonal signatures disagree far past the screen threshold),
    // so they elect hub 2 — a B member — and spoke to it: B must come
    // out WHOLE, in both modes, with full group parity between them.
    val vecs = ((0L until 12L).map(i => (i, jig(Seq(0.0, 0.2, 1.0, 0.1), i))) ++
      (12L until 16L).map(i => (i, jig(Seq(1.0, 0.1, 0.0, 0.2), i))))
      .toDF("vec_id", "embedding")
    val all = run(vecs, "all")
    val span = run(vecs, "spanning")
    val cAll = all.map(r => r._1 -> r._2).toMap
    val cSpan = span.map(r => r._1 -> r._2).toMap
    // dominant block: whole, exact parity
    assert((0L until 12L).forall(cSpan(_) == cAll(0L)))
    // secondary block: WHOLE in both modes (the round-12 upgrade), and
    // distinct from the dominant block
    assert((12L until 16L).forall(cAll(_) == cAll(12L)), s"all-pairs fragmented B: $cAll")
    assert((12L until 16L).forall(cSpan(_) == cSpan(12L)), s"spanning fragmented B: $cSpan")
    assert(cSpan(12L) != cSpan(0L) && cAll(12L) != cAll(0L))
    // and full output parity between the modes on this geometry
    assert(span == all, s"\n all  $all\n span $span")
  }
}
