package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Deterministic sampling for training-data pipelines.
  *
  * `sample(fraction)` draws a different set every run (and every retry of a
  * failed task!); at 100 TB a corpus sample must be a pure function of the
  * row so reruns, incremental refreshes and lineage audits agree. These
  * samplers keep a row iff a portable md5-derived hash of its id lands
  * under the target rate — embarrassingly parallel, no shuffle, and any
  * engine in the pipeline (the DuckDB oracle included) reproduces the
  * selection bit-for-bit.
  *
  * Reference analogue: the fleet simulator's per-device deterministic
  * seeding (`/root/reference/iot_simulator/iot_simulator.py:25-151`) — the
  * same reproducibility contract, applied to row selection.
  */
object Sampling {

  /** Keep rows whose hash lands in [0, pct) of 100 buckets. */
  def hashSample(df: DataFrame, idCol: String, pct: Int, seed: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hash32(col(idCol).cast("string"), seed) % 100 < pct)
  }

  /** The shared keep predicate: the portable id-hash lands under
    * `ratePpm`/10^6. The decision is the integer comparison
    * `hash·10^6 < ratePpm·2^32` — both products stay under 2^53, so every
    * engine and every rerun draws the identical sample. */
  def keepByPpm(id: Column, ratePpm: Column, seed: Int): Column =
    hash32(id.cast("string"), seed) * lit(1000000L) <
      ratePpm.cast("long") * lit(4294967296L)

  /** Weighted variant: keep each row with probability `weightPpm / 10^6`
    * (e.g. sample proportional to a quality score — the standard
    * importance-sampling downsample for training corpora). */
  def weightedHashSample(
      df: DataFrame, idCol: String, weightPpmCol: String, seed: Int): DataFrame =
    df.filter(keepByPpm(col(idCol), col(weightPpmCol), seed))

  /** Deterministic global shuffle — the pre-training corpus shuffle as a
    * pure function of the data: position by (id-hash, id) instead of
    * rand(). Reruns, retried tasks, and any other engine produce the
    * identical permutation, so shard N of the shuffled corpus is stable
    * across incremental rebuilds (what makes resumable multi-epoch
    * training reproducible). Different `seed` → independent permutation
    * (epoch reshuffles).
    *
    * Scale shape: a single global-order window would drag every row into
    * one partition. Instead the uniform hash is cut into `numBuckets`
    * fixed-width ranges; ranks are per-bucket windows (parallel), offsets
    * come from one tiny count aggregation (numBuckets rows — driver-sized
    * by construction), and `offset + rank` equals the global
    * (hash, id)-order position exactly because bucket boundaries follow
    * the hash order. One shuffle on the bucket key, never a global sort. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, seed: Int, numBuckets: Int = 256): DataFrame = {
    require(numBuckets >= 1)
    val width = ((1L << 32) + numBuckets - 1) / numBuckets
    val withB = df
      .withColumn("_h", hash32(col(idCol).cast("string"), seed))
      .withColumn("_b", expr(s"_h div ${width}L"))
    val counts = withB.groupBy(col("_b")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val row = (b, acc); acc += n; row }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("_b", "_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("_h"), col(idCol))
    withB
      .join(broadcast(offsetsDf), Seq("_b"))
      .withColumn("shuffle_pos", (col("_off") + row_number().over(w)).cast("bigint"))
      .drop("_h", "_b", "_off")
  }

  /** Per-group cap: keep at most `maxPerGroup` rows per group, chosen by
    * deterministic (id-hash, id) rank — the source-balancing op that stops
    * one crawl dump from dominating a mixed corpus. Rank-k selection, so
    * the map side emits at most `maxPerGroup` rows per task per group
    * (partial WindowGroupLimit / GroupedTopKRewrite) — the shuffle never
    * carries a hot source's full row set. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      maxPerGroup: Int, seed: Int): DataFrame = {
    require(maxPerGroup >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hash32(col(idCol).cast("string"), seed), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPerGroup)
      .drop("_rn")
  }

  /** Cluster-balanced DIVERSITY sample: at most `perCell` docs from each
    * of `nCells` embedding k-means cells, chosen by deterministic
    * (id-hash, id) rank within the cell — the semantic-coverage
    * counterpart of [[capPerGroup]]'s source balancing (a uniform
    * hash-sample over a skewed corpus reproduces the skew; sampling the
    * CELLS equally keeps the long-tail topics represented — the
    * cluster-balanced curation step). Portable k-means
    * ([[Ivf.buildPortable]]) + rank-k per cell, so the whole selection
    * — including the trained cells — is oracle-reproducible; the rank
    * filter takes the GroupedTopKRewrite / WindowGroupLimit bounded
    * top-k, and assignment is the zero-shuffle literal-centroid map. */
  def diverseSample(vecs: DataFrame, perCell: Int, nCells: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Int = 7): DataFrame =
    capPerGroup(
      Ivf.buildPortable(vecs, nCells, 2, idCol, vecCol).assigned
        .select(col(idCol), col("cell_id")),
      idCol, "cell_id", perCell, seed)

  /** Temperature rebalancing at α = 0.5 (the standard multilingual
    * smoothing): group g is kept with rate √(min_count / count_g), so the
    * most under-represented group passes whole and every other group is
    * downsampled toward the α-tempered distribution. α = 0.5 is exact
    * cross-engine: `/` and `sqrt` are IEEE correctly-rounded in every
    * engine (unlike `pow`), so the ppm rate — and therefore the selected
    * row set — is bit-identical in the DuckDB oracle. The rate table is
    * one count aggregation (|groups| rows, broadcast); the filter itself
    * is a narrow codegen'd predicate. */
  def sqrtRebalance(df: DataFrame, idCol: String, groupCol: String,
      seed: Int): DataFrame =
    applyRates(df, sqrtRates(df, groupCol), idCol, groupCol, seed)

  /** The α=0.5 rate table alone: (groupCol, _rate_ppm). Computed on a
    * static profile batch and handed to [[applyRates]] — including over a
    * stream, where the rates are the frozen side of a stream-static
    * broadcast join (StreamingRefineSpec). */
  def sqrtRates(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_cnt"))
    counts
      .crossJoin(broadcast(counts.agg(min(col("_cnt")).as("_mn"))))
      .select(col(groupCol),
        floor(lit(1000000.0) * sqrt(col("_mn").cast("double") / col("_cnt")))
          .cast("long").as("_rate_ppm"))
  }

  /** Apply a (groupCol, _rate_ppm) rate table to rows (batch or stream):
    * broadcast join + the portable integer keep predicate. */
  def applyRates(df: DataFrame, rates: DataFrame, idCol: String,
      groupCol: String, seed: Int): DataFrame =
    df.join(broadcast(rates), Seq(groupCol))
      .filter(keepByPpm(col(idCol), col("_rate_ppm"), seed))
      .drop("_rate_ppm")

  /** Stratified variant: per-stratum percentages (e.g. boost low-resource
    * languages, downsample crawl dumps), `defaultPct` for unlisted strata.
    * The rate table is compiled into a CASE expression — no join, the
    * filter stays a narrow codegen'd predicate the scan can stream
    * through. */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int, seed: Int): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
    val pct: Column = rates.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hash32(col(idCol).cast("string"), seed) % 100 <
      coalesce(pct, lit(defaultPct)))
  }

  /** Deterministic fractional repetition — the epoch-mixing/upsampling step
    * that materializes each row `weightPpm / 10^6` times in expectation
    * (e.g. 2_500_000 ppm = every row twice, plus a third copy for a
    * hash-selected half). floor(w) copies are unconditional; the
    * fractional remainder is a portable-hash Bernoulli draw per row, so
    * the realized corpus is a pure function of (ids, weights, seed) —
    * reruns, retried tasks, and the DuckDB oracle materialize the
    * identical multiset. Weights < 1 downsample with the same rule (0
    * unconditional copies + fractional draw), unifying up- and
    * downsampling in one operator.
    *
    * Scale shape: a map-side `explode(sequence(...))` — row expansion
    * happens inside the scan task with ZERO shuffle; the output column
    * `copy` (1-based) distinguishes repetitions so a downstream
    * deterministic shuffle can interleave epochs. */
  def repeatByWeight(df: DataFrame, idCol: String,
      weightPpmCol: String, seed: Int): DataFrame = {
    val w = col(weightPpmCol).cast("long")
    val extra = when(
      hash32(col(idCol).cast("string"), seed) * lit(1000000L) <
        (w % 1000000L) * lit(4294967296L), 1L).otherwise(0L)
    df.withColumn("_k", expr(s"CAST($weightPpmCol AS BIGINT) div 1000000") + extra)
      .withColumn("copy",
        explode(when(col("_k") >= 1L, sequence(lit(1L), col("_k")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("_k")
  }

  /** Deterministic negative sampling for contrastive training: each anchor
    * draws `k` pseudo-random negatives from `candidates` WITHOUT scoring
    * all |A|×|C| pairs. Candidates are hashed into `buckets`; each
    * (anchor, slot) pair hashes to ONE bucket and takes that bucket's
    * candidate minimizing the pair hash (anchor excluded, ties by id) —
    * an equi-join on the bucket id, cost |A|·k·(|C|/buckets). Rerun- and
    * engine-stable: every choice is an md5 order, no RNG state.
    *
    * A slot whose bucket is empty (or holds only the anchor) yields no
    * row; two slots of one anchor can land on the same negative — callers
    * wanting exactly-k distinct negatives oversample slots and dedup.
    * Size `buckets` ≈ |C|/poolSize: larger ⇒ cheaper join, smaller pool
    * per slot. */
  def hashNegatives(anchors: DataFrame, candidates: DataFrame, idCol: String,
      k: Int, buckets: Int, seed: Int = 21): DataFrame = {
    require(k >= 1 && buckets >= 1)
    val cand = candidates.select(col(idCol).cast("string").as("cand_id"))
      .withColumn("_b", hash32(col("cand_id"), seed) % buckets)
    val slots = anchors.select(col(idCol).cast("string").as("anchor_id"))
      .withColumn("slot", explode(sequence(lit(0L), lit((k - 1).toLong))))
      .withColumn("_b",
        hash32(concat_ws("#", col("anchor_id"), col("slot")), seed + 1) % buckets)
    slots.join(cand, "_b")
      .filter(col("cand_id") =!= col("anchor_id"))
      .withColumn("_h",
        hash32(concat_ws(":", col("anchor_id"), col("cand_id")), seed + 2))
      .groupBy(col("anchor_id"), col("slot"))
      // min over (hash, id) structs: a deterministic argmin even at a
      // (vanishingly unlikely) hash collision
      .agg(min(struct(col("_h"), col("cand_id"))).as("_m"))
      .select(col("anchor_id"), col("slot"), col("_m.cand_id").as("neg_id"))
  }

  /** Inverse-CDF thresholds of Poisson(1) on the 32-bit hash domain:
    * floor(P(X <= k)·2^32) for k = 0..6 (the tail >= 7 is ~8·10^-5 and
    * collapses into weight 7). Integer constants, so both engines draw
    * the identical weight from the identical hash. */
  private val PoissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L)

  /** Pseudo-Poisson(1) weight of a 32-bit hash column (0..7). */
  def poissonWeight(h: Column): Column =
    PoissonThresholds.zipWithIndex.foldRight(lit(PoissonThresholds.size): Column) {
      case ((t, k), els) => when(h < t, lit(k)).otherwise(els)
    }.cast("long")

  /** Poisson bootstrap: per-group mean with a percentile confidence
    * interval from `b` deterministic resamples. The classic bootstrap
    * indexes n draws into an n-row array — impossible to shard; the
    * Poisson bootstrap (the planet-scale standard) instead gives every
    * row an independent Poisson(1) multiplicity per replicate, which is a
    * pure per-row computation: explode `b` replicate ids, draw the weight
    * from the portable row-hash, and partially aggregate — the shuffle
    * carries |groups|·b cells, never the data. Replicate means are exact
    * integer cents (decimal sums, floor division); the CI is order
    * statistics over each group's `b` sorted means (rank floor(0.05b)+1
    * and ceil(0.95b) for 90%). Deterministic end-to-end: reruns, retried
    * tasks and the DuckDB oracle draw identical resamples.
    *
    * Returns (groupCol, n_rows, mean_cents, ci_lo_cents, ci_hi_cents). */
  def poissonBootstrapCi(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, b: Int = 100, seed: Int = 33): DataFrame = {
    require(b >= 20, "need enough replicates for 5th/95th percentiles")
    val base0 = df.select(col(groupCol).as("g"),
      col(idCol).cast("string").as("k"),
      col(valueCol).cast(org.apache.spark.sql.types.DecimalType(30, 2)).as("p"))
    // The explode below multiplies every input row ×b before the (cheap,
    // map-combined) aggregate — the ONE heavy narrow phase of this
    // operator. A source that arrives in fewer splits than the cluster
    // has cores (the single-row-group fixture files; a small dimension
    // at real scale) would run that ×b phase under-parallelized, so
    // spread the pre-explosion rows first: shuffling 1× of the data to
    // parallelize b× of the work is always the right trade. Keyed on the
    // row id (not round-robin) so the exchange is deterministic.
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val base = if (base0.rdd.getNumPartitions < cores)
      base0.repartition(cores, col("k")) else base0
    val rep = base
      .select(col("g"), col("p"), col("k"),
        explode(expr(s"sequence(0, ${b - 1})")).as("rb"))
      .withColumn("w",
        poissonWeight(hash32(concat_ws("@", col("k"), col("rb")), seed)))
    // A replicate whose Poisson draws total weight 0 (probability ~e^-n
    // per replicate — material only for 1-2-row groups) has NO resample
    // mean: it is DROPPED, not NULL-ed, because engines disagree on NULL
    // sort position (Spark sort_array: NULLs first; DuckDB list(... ORDER
    // BY): NULLs last) and a NULL would skew the order-statistic ranks.
    // The CI ranks are taken over the m <= b SURVIVING replicate means
    // (rank floor(m/20)+1 and m - floor(m/20)); for groups of >= ~5 rows
    // all b replicates survive in practice and the ranks are the classic
    // 6/95 of b=100. Callers should treat CIs on groups of 1-2 rows as
    // advisory — the bootstrap itself is degenerate there.
    val means = rep.groupBy(col("g"), col("rb"))
      .agg(sum(col("w") * col("p")).as("tot"), sum(col("w")).as("n"))
      .filter(col("n") > 0)
      .select(col("g"),
        expr("CAST(tot * 100 AS BIGINT) div n").as("mean_b"))
    val ci = means.groupBy(col("g"))
      .agg(sort_array(collect_list(col("mean_b"))).as("ms"))
      .select(col("g"),
        expr("element_at(ms, CAST(size(ms) div 20 + 1 AS INT))").as("ci_lo_cents"),
        expr("element_at(ms, CAST(size(ms) - size(ms) div 20 AS INT))").as("ci_hi_cents"))
    val pt = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("tot"))
      .select(col("g"), col("n_rows"),
        expr("CAST(tot * 100 AS BIGINT) div n_rows").as("mean_cents"))
    pt.join(ci, Seq("g"))
      .select(col("g").as(groupCol), col("n_rows"), col("mean_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"))
  }

  /** Neyman-optimal stratified-sample allocation: split a fixed label /
    * annotation budget across strata proportional to N_h·σ_h — the
    * sample-DESIGN step before [[stratifiedHashSample]] draws it. High
    * variance earns more labels; a perfectly homogeneous stratum earns
    * (correctly) almost none; `prop_n` (∝ N_h) rides along as the naive
    * baseline the design beats.
    *
    * Exactness: N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — the sqrt of an EXACT
    * integer (population-σ identity), computed once per stratum and
    * floored to bigint; every other step is integer arithmetic
    * (allocations are floor divisions of `budget·w_h` by Σw, so the
    * total never exceeds the budget). The one sqrt is IEEE
    * correctly-rounded in every engine (the [[sqrtRebalance]] contract).
    *
    * Scale shape: one map-combined groupBy over the corpus; everything
    * after runs on the |strata|-row table (the single-partition window
    * sorts strata, not data). Returns
    * (groupCol, n_h, w_h, alloc_n, prop_n). */
  def neymanAllocation(df: DataFrame, groupCol: String, valueCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1)
    val d = col(valueCol).cast("decimal(38,0)")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_h"), sum(d).as("_s"), sum(d * d).as("_ss"))
      .select(col(groupCol), col("n_h"),
        expr("CAST(n_h AS DECIMAL(38,0)) * _ss - _s * _s").as("_varnum"))
      .withColumn("w_h",
        floor(sqrt(col("_varnum").cast("double"))).cast("long"))
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("_tw", sum(col("w_h")).over(whole))
      .withColumn("_tn", sum(col("n_h")).over(whole))
      .select(col(groupCol), col("n_h"), col("w_h"),
        expr(s"$budget * w_h div _tw").as("alloc_n"),
        expr(s"$budget * n_h div _tn").as("prop_n"))
  }

  /** Per-group token-budget selection: inside each group (source/domain),
    * rank rows quality-first (`scoreCol` desc, `idCol` asc) and keep the
    * prefix whose cumulative `weightCol` (token count) stays within
    * `budgetNum/budgetDen` of the group's total weight — the "best 30% of
    * tokens per source" curation gate, the budgeted counterpart of the
    * temperature rebalance (q72): that one equalizes PROPORTIONS, this one
    * spends a hard token budget on the highest-quality rows.
    *
    * Deterministic: the order is total (score, id), the budget test is an
    * integer cross-multiplication (`cum·den ≤ total·num` — no float
    * rounding at the boundary). Scale shape: one shuffle on the group key;
    * the ranking window and running sum are per-group (parallel across
    * groups), and group totals ride the same shuffle — no global sort, no
    * second pass over the data. A pathologically hot group bounds a task
    * (same caveat as every per-group window; salt or split upstream). */
  def budgetSelect(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, scoreCol: String,
      budgetNum: Int, budgetDen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetNum >= 0 && budgetDen > 0)
    val byScore = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val all = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(idCol), col(groupCol), col(weightCol), col(scoreCol))
      .withColumn("cum_weight", sum(col(weightCol)).over(
        byScore.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("group_weight", sum(col(weightCol)).over(all))
      .filter(col("cum_weight") * budgetDen <= col("group_weight") * budgetNum)
  }
}
