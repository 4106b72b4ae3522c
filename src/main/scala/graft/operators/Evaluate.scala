package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/score evaluation over labeled data (the measurement half of a
  * training pipeline: did the quality score / anomaly score / retrieval
  * score actually rank positives above negatives?).
  *
  * Determinism discipline: scores are grouped by their exact stored value
  * (no arithmetic on them, so both engines see identical bits), all pair
  * counting is integer, ties are counted exactly, and the single division
  * happens once at readout in ppm — bit-identical AUC in any engine.
  */
object Evaluate {

  /** Binary AUC by the Mann-Whitney pair count, computed from the
    * per-distinct-score class histogram — never a per-row rank:
    *
    *   AUC = (concordant + ties/2) / (n_pos · n_neg)
    *   concordant = Σ_s n_pos(s) · n_neg(< s),  ties = Σ_s n_pos(s) · n_neg(s)
    *
    * emitted as `auc_ppm = ((2·conc + ties)·10^6) div (2·n_pos·n_neg)`.
    *
    * Scale shape: one groupBy on the score value (corpus-sized shuffle,
    * map-side combined), then a window over the DISTINCT-score table —
    * orders of magnitude smaller than the corpus. If even the distinct
    * table outgrows one sort, bucket scores first ([[Histogram]]) and
    * trade exactness for a bin-width AUC bound; the pair algebra is
    * unchanged. Returns one row:
    * (n_pos, n_neg, concordant, tied, auc_ppm, auc). */
  def binaryAuc(df: DataFrame, labelCol: Column, scoreCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g
      .withColumn("negs_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum(col("np") * col("negs_below")).as("concordant"),
        sum(col("np") * col("nn")).as("tied"))
      .select(
        col("n_pos"), col("n_neg"), col("concordant"), col("tied"),
        expr("((2 * concordant + tied) * 1000000) div (2 * n_pos * n_neg)")
          .as("auc_ppm"))
      .withColumn("auc", col("auc_ppm").cast("double") / 1000000.0)
  }

  /** Mean reciprocal rank over a ranked retrieval result: per query, the
    * reciprocal of the FIRST relevant rank (queries with no relevant hit
    * in their list count 0 — they stay in the denominator). Carried as
    * exact integers: `rr_ppm = 10^6 div first_rank`, `mrr_ppm =
    * Σ rr_ppm div n_queries` — no float summation order to drift. Input
    * is any (query_id, rk, relevant) frame (rk 1-based, e.g. a [[Knn]]
    * or BM25 result joined to a qrels flag); `queries` supplies the full
    * query universe so empty result lists still count. One groupBy on
    * query_id then a 1-row fold. */
  def mrr(ranked: DataFrame, queries: DataFrame, relCol: Column): DataFrame = {
    val firsts = ranked
      .filter(relCol)
      .groupBy(col("query_id"))
      .agg(min(col("rk")).as("first_rel"))
    queries
      .join(firsts, Seq("query_id"), "left")
      .agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("first_rel").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        coalesce(sum(expr("1000000 div first_rel")), lit(0L)).as("_s"))
      .select(col("n_queries"), col("n_hit"),
        expr("_s div n_queries").as("mrr_ppm"))
  }

  /** Binary-relevance nDCG@k per query, in exact integer ppm. The DCG
    * position weights are PRECOMPUTED constants
    * `w_i = round(1e6 / log2(i+1))` — libm runs once at plan build (the
    * same JVM call generates the operator literals and the oracle SQL),
    * never inside either engine, so even the "logarithmic" ranking
    * metric is hash-checkable. `ranked` carries (query_id, rk); `relCol`
    * marks relevant rows; `queries` carries (query_id, n_rel) where
    * n_rel is the query's total relevant-candidate count — IDCG
    * truncates at min(k, n_rel); n_rel = 0 yields null nDCG. The DCG
    * pass is one rank-bounded aggregate; everything else is
    * queries-sized. */
  def ndcgAtK(ranked: DataFrame, queries: DataFrame, relCol: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    val w = ndcgWeights(k)
    val cum = w.scanLeft(0L)(_ + _).tail
    val wArr = array(w.map(lit): _*)
    val cumArr = array(cum.map(lit): _*)
    val dcg = ranked.filter(relCol && col("rk") <= k)
      .groupBy(col("query_id"))
      .agg(sum(element_at(wArr, col("rk").cast("int"))).as("_d"))
    queries
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("_d"), lit(0L)).as("dcg_ppm"),
        when(col("n_rel") > 0,
          element_at(cumArr, least(lit(k.toLong), col("n_rel")).cast("int")))
          .otherwise(lit(0L)).as("idcg_ppm"))
      .withColumn("ndcg_ppm",
        when(col("idcg_ppm") > 0, expr("dcg_ppm * 1000000 div idcg_ppm")))
  }

  /** The shared ppm weight table `round(1e6 / log2(i+1))`, i = 1..k —
    * used by both the operator literals and the oracle SQL generator. */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** Reliability (calibration) table: `nBins` fixed-width bins over the
    * integer score range `[lo, hi]`; per bin the observed positive rate
    * in ppm. A well-calibrated score has `pos_rate_ppm` tracking the bin
    * midpoint. One map-side-combined groupBy on the bin id — the output
    * is `nBins` rows regardless of corpus size; empty bins are absent
    * (they have no observed rate). */
  def calibrationBins(df: DataFrame, labelCol: Column, scoreCol: String,
      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, s"nBins=$nBins range=[$lo,$hi]")
    df
      .filter(col(scoreCol) >= lo && col(scoreCol) <= hi)
      .withColumn("bin",
        least(lit(nBins - 1L),
          expr(s"(($scoreCol - $lo) * $nBins) div (${hi - lo})"))
          .cast("bigint"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000) div n").as("pos_rate_ppm"))
  }

  /** Kolmogorov-Smirnov separation of a score between the two classes:
    *
    *   KS = max_t |F_pos(t) − F_neg(t)|
    *
    * over the per-distinct-score class histogram. With cumulative class
    * counts cp(t), cn(t) and totals P, N the per-threshold distance is
    * the integer |cp·N − cn·P|, and `ks_ppm = max (|cp·N − cn·P|·10^6)
    * div (P·N)` — one division per DISTINCT score, no float CDFs.
    * `at_score` is the smallest score attaining the max (the natural
    * cut point), chosen by exact integer comparison.
    *
    * Scale shape: identical to [[binaryAuc]] — one map-side-combined
    * groupBy on the score value, then windows over the distinct-score
    * table only. Returns one row
    * (n_pos, n_neg, ks_ppm, at_score, ks). */
  def ksStatistic(df: DataFrame, labelCol: Column, scoreCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("sc"))
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nn"))
    val cum = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g
      .withColumn("cp", sum(col("np")).over(cum))
      .withColumn("cn", sum(col("nn")).over(cum))
      .withColumn("tp", sum(col("np")).over(all))
      .withColumn("tn", sum(col("nn")).over(all))
      .withColumn("d_ppm",
        expr("(abs(CAST(cp AS DECIMAL(38,0)) * tn - CAST(cn AS DECIMAL(38,0)) * tp)" +
          " * 1000000) div (CAST(tp AS DECIMAL(38,0)) * tn)"))
      .agg(
        max(col("tp")).as("n_pos"),
        max(col("tn")).as("n_neg"),
        max(col("d_ppm")).as("ks_ppm"),
        // smallest score attaining the max distance: maximize (d, -sc);
        // the ordering struct is unique per row, so max_by is deterministic
        max_by(col("sc"), struct(col("d_ppm"), -col("sc"))).as("at_score"))
      .select(col("n_pos"), col("n_neg"), col("ks_ppm"),
        expr("CAST(at_score AS BIGINT)").as("at_score"))
      .withColumn("ks", col("ks_ppm").cast("double") / 1000000.0)
  }

  /** Precision/recall/F1 sweep over every distinct score threshold t
    * (predict positive when score ≥ t). From the descending cumulative
    * class histogram: tp(t), fp(t) are running sums, fn(t) = P − tp(t),
    * and each metric is one integer ppm division per distinct score —
    * no per-row ranks, no float rates.
    *
    * Output is distinct-score-sized (threshold, tp, fp, fn,
    * precision_ppm, recall_ppm, f1_ppm) — the full operating-point
    * table a threshold choice reads off. Scale shape: one corpus
    * groupBy, then windows over the distinct-score table. */
  def thresholdSweep(df: DataFrame, labelCol: Column, scoreCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("threshold"))
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nn"))
    val cum = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("threshold"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g
      .withColumn("tp", sum(col("np")).over(cum))
      .withColumn("fp", sum(col("nn")).over(cum))
      .withColumn("fn", sum(col("np")).over(all) - col("tp"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) div (tp + fp)").as("precision_ppm"),
        expr("(tp * 1000000) div (tp + fn)").as("recall_ppm"),
        expr("(2 * tp * 1000000) div (2 * tp + fp + fn)").as("f1_ppm"))
  }

  /** Cumulative gain / lift table: rank by score DESCENDING, cut into
    * `nBins` equal-count bins, and per bin report the positive capture.
    * A whole distinct-score group lands in the bin of its first row
    * (`bin = cum_before·nBins div N`) — deterministic under ties, no
    * row-level ranks. `gain_ppm` is the cumulative share of ALL
    * positives captured through the bin; `lift_ppm` is the bin's
    * positive rate over the global rate (1e6 = average), both exact
    * integer cross-multiplications.
    *
    * Scale shape: identical to [[binaryAuc]] — one map-side-combined
    * groupBy on the score, windows over the distinct-score histogram,
    * then an nBins-row aggregate. */
  def cumulativeGain(df: DataFrame, labelCol: Column, scoreCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins=$nBins")
    val g = df
      .groupBy(col(scoreCol).as("sc"))
      .agg(count(lit(1)).as("n"),
        sum(when(labelCol, 1L).otherwise(0L)).as("np"))
    val desc = Window.orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val binned = g
      .withColumn("cum_before", coalesce(sum(col("n")).over(desc), lit(0L)))
      .withColumn("nt", sum(col("n")).over(all))
      .withColumn("pt", sum(col("np")).over(all))
      .withColumn("bin", expr(s"(cum_before * $nBins) div nt"))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("np")).as("n_pos"),
        max(col("nt")).as("nt"), max(col("pt")).as("pt"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_pos"),
        expr("(CAST(cum_pos AS DECIMAL(38,0)) * 1000000) div nullif(pt, 0)")
          .as("gain_ppm"),
        expr("(CAST(n_pos AS DECIMAL(38,0)) * nt * 1000000)" +
          " div nullif(CAST(n AS DECIMAL(38,0)) * pt, 0)").as("lift_ppm"))
  }

  /** Cohen's kappa: chance-corrected agreement between two categorical
    * labelings (multi-class — e.g. a classifier's prediction against
    * ground truth, or two annotators). With observed agreement
    * Σdiag / N and chance agreement Σ_k r_k·c_k / N²,
    *
    *   kappa = (N·Σdiag − Σ r·c) / (N² − Σ r·c)
    *
    * computed entirely in decimal(38) integers, one truncating ppm
    * division at readout (Spark `div` and DuckDB `//` both truncate
    * toward zero, so a negative kappa is engine-exact too). Degenerate
    * tables (both sides constant ⇒ denominator 0) yield null, never a
    * division error.
    *
    * Scale shape: one corpus groupBy on the (a, b) cell key; marginals
    * derive from the cell table and meet on the category key (never a
    * second corpus pass); the final 1-row combine attaches two
    * category-sized aggregates. Returns one row
    * (n, n_agree, kappa_ppm, kappa). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a").as("k")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("b").as("k")).agg(sum(col("o")).as("c"))
    // Σ_k r_k·c_k over the category union — categories seen on only one
    // side contribute 0 (their other marginal is 0)
    val chance = rowT.join(colT, Seq("k"), "full_outer")
      .agg(sum(expr(
        "CAST(coalesce(r, 0) AS DECIMAL(38,0)) * coalesce(c, 0)"))
        .as("sum_rc"))
    val obs = cells.agg(
      sum(col("o")).as("n"),
      sum(when(col("a") === col("b"), col("o")).otherwise(0L)).as("n_agree"))
    obs.crossJoin(broadcast(chance))
      .select(col("n"), col("n_agree"),
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * n - sum_rc = 0 THEN NULL
                ELSE ((CAST(n AS DECIMAL(38,0)) * n_agree - sum_rc) * 1000000)
                     div (CAST(n AS DECIMAL(38,0)) * n - sum_rc) END""")
          .cast("bigint").as("kappa_ppm"))
      .withColumn("kappa", col("kappa_ppm").cast("double") / 1000000.0)
  }

  /** Pearson chi-squared statistic for independence of two categorical
    * columns, in exact integer arithmetic: with cell count O, row total
    * r, column total c and grand total N,
    *
    *   chi2 = Σ (O − r·c/N)² / (r·c/N)  =  Σ (O·N − r·c)² / (N·r·c)
    *
    * emitted as `chi2_ppm = Σ ((O·N − r·c)²·10^6) div (N·r·c)` — one
    * integer division per OBSERVED cell, no float expectation values.
    * (Absent cells — O = 0 — contribute r·c/N each; their total is
    * added algebraically as `(N − Σ_observed r·c/N)`-free form below.)
    *
    * Scale shape: one corpus groupBy on the (a, b) cell key; row/column
    * totals derive from the cell table (never a second corpus pass) and
    * join back onto it — all category-cardinality-sized. The squared
    * terms run in decimal(38) (int128 in DuckDB), so O·N up to ~10^19
    * is exact; per-term floor division defines the ppm rounding.
    * Returns one row (n, n_cells, chi2_ppm, chi2). */
  /** Cluster-quality report over an embedding column with a cluster
    * assignment (label cells here; any assignment column works): per
    * cluster the mean squared distance to its own centroid, the mean
    * squared distance to the nearest OTHER centroid, and the mean
    * simplified (centroid-based / "medoid-free") silhouette
    *
    *   s = (b − a) / max(a, b),  a = ‖x − c_own‖²,  b = min_{c≠own} ‖x − c‖²
    *
    * — the standard O(n·k) silhouette approximation (full silhouette is
    * O(n²) pairwise and does not scale; centroids stand in for cluster
    * means, which is exact for squared-Euclidean k-means geometry).
    *
    * Scale shape: centroids are k·dim cells from one exploded shuffle-agg
    * over the corpus; the per-point distance pass is a BROADCAST cross
    * join (k small) — map-side only, no second corpus shuffle; the final
    * per-cluster agg is k rows. Cross-engine determinism: centroid
    * components go through exact decimal means rounded to 6dp (so both
    * engines compare against identical centroid bits), distances fold
    * left-to-right over the dims via `aggregate`, and per-cluster means
    * go through [[graft.queries.Q.dsum]]-style decimal sums. */
  def clusterQuality(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pts = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
    val centroids = pts
      .select(col("lbl"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("lbl"), col("pos"))
      .agg(round(sum(col("x").cast(DecimalType(30, 15))).cast("double") /
        count(lit(1)), 6).as("m"))
      .groupBy(col("lbl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("lbl").as("clbl"), expr("transform(pm, p -> p.m)").as("c"))
    val dists = pts.crossJoin(broadcast(centroids))
      .withColumn("dist2", expr(
        "aggregate(zip_with(v, c, (x, m) -> (x - m) * (x - m)), 0D, (acc, y) -> acc + y)"))
    val perPoint = dists.groupBy(col("id"), col("lbl"))
      .agg(
        max(when(col("clbl") === col("lbl"), col("dist2"))).as("a"),
        min(when(col("clbl") =!= col("lbl"), col("dist2"))).as("b"))
      .withColumn("s",
        when(greatest(col("a"), col("b")) <= lit(0.0), lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
    def dmean(c: Column) = round(
      sum(c.cast(DecimalType(30, 15))).cast("double") / count(lit(1)), 6)
    perPoint.groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n"),
        dmean(col("a")).as("mean_intra"),
        dmean(col("b")).as("mean_nearest_other"),
        dmean(col("s")).as("mean_silhouette"))
  }

  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n_total"))
    // zero-count cells contribute (r·c/N)² / (r·c/N) = r·c/N each; the
    // full zero-cell sum is Σ_all r·c/N − Σ_observed r·c/N = N − Σ_obs r·c/N
    // (in ppm: N·10^6 − Σ (r·c·10^6) div N), so absent cells are handled
    // without materializing them
    val d = "CAST(o AS DECIMAL(38,0)) * n_total - CAST(r AS DECIMAL(38,0)) * c"
    cells
      .join(rowT, "a").join(colT, "b")
      .crossJoin(broadcast(n))
      .agg(
        max(col("n_total")).as("n"),
        count(lit(1)).as("n_cells"),
        sum(expr(s"(($d) * ($d) * 1000000)" +
          " div (CAST(n_total AS DECIMAL(38,0)) * r * c)")).as("obs_ppm"),
        sum(expr("(CAST(r AS DECIMAL(38,0)) * c * 1000000) div n_total"))
          .as("obs_exp_ppm"))
      .select(col("n"), col("n_cells"),
        (col("obs_ppm") + col("n") * 1000000L - col("obs_exp_ppm"))
          .as("chi2_ppm"))
      .withColumn("chi2", col("chi2_ppm").cast("double") / 1000000.0)
  }

  /** Spearman rank correlation between two columns, tie-corrected
    * (average ranks), as Pearson over ranks — the monotone-association
    * companion to q110's Pearson matrix (rank-based, so outliers and
    * nonlinearity don't fake or hide a relationship).
    *
    * No per-row rank window: a row's DOUBLED average rank is
    * `2·|{v' < v}| + |{v' = v}| + 1`, read off the per-distinct-value
    * count table (corpus-sized groupBy, then a window over the DISTINCT
    * values — bounded by the value domain, broadcast-class for ppm/score
    * domains). Doubling keeps ranks integral, so every moment accumulates
    * as an exact decimal; Pearson-over-ranks is scale/shift-invariant, so
    * rho is unchanged. The readout is a fixed shape over exact integers —
    * cast, multiply, sqrt, divide once — bit-identical in any engine.
    * Degenerate (constant) columns yield null, never NaN. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def ranks2(c: String, out: String): DataFrame = {
      val g = df.groupBy(col(c).as(c)).agg(count(lit(1)).as("_cnt"))
      val ord = Window.orderBy(col(c))
      g.withColumn("_less", coalesce(sum(col("_cnt")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(c), (col("_less") * 2 + col("_cnt") + 1).as(out))
    }
    df.select(col(xCol), col(yCol))
      .join(broadcast(ranks2(xCol, "_rx")), Seq(xCol))
      .join(broadcast(ranks2(yCol, "_ry")), Seq(yCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_rx").cast("decimal(38,0)")).as("_sx"),
        sum(col("_ry").cast("decimal(38,0)")).as("_sy"),
        sum(col("_rx").cast("decimal(38,0)") * col("_rx").cast("decimal(38,0)")).as("_sxx"),
        sum(col("_ry").cast("decimal(38,0)") * col("_ry").cast("decimal(38,0)")).as("_syy"),
        sum(col("_rx").cast("decimal(38,0)") * col("_ry").cast("decimal(38,0)")).as("_sxy"))
      .select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * _sxy - _sx * _sy").as("_num"),
        expr("CAST(n AS DECIMAL(38,0)) * _sxx - _sx * _sx").as("_dx"),
        expr("CAST(n AS DECIMAL(38,0)) * _syy - _sy * _sy").as("_dy"))
      .select(col("n"),
        when(col("_dx") > 0 && col("_dy") > 0,
          round(col("_num").cast("double") /
            sqrt(col("_dx").cast("double") * col("_dy").cast("double")), 6))
          .as("spearman"))
  }

  /** Split-conformal prediction intervals with empirical coverage — the
    * distribution-free uncertainty audit: a deterministic 60/20/20
    * train/calibration/test split (portable id-hash folds), a per-group
    * point predictor (integer-cents train mean), the conformal quantile
    * q-hat = the ceil((n_cal+1)·(1−α))-th smallest absolute calibration
    * residual, and the guaranteed-≥(1−α) coverage CHECKED on the held-out
    * test fold. q117's calibration bins ask "is the score honest?"; this
    * asks "is the interval honest?" — the eval a prediction-serving
    * pipeline runs before shipping intervals.
    *
    * Exactness: values in integer cents, residuals integer, q-hat an
    * order statistic (no interpolation — the conformal definition), the
    * one division per group at readout in ppm. k clamps to n_cal (the
    * degenerate tiny-calibration case where conformal demands an infinite
    * interval).
    *
    * Scale shape: folds are a narrow hash predicate (no shuffle); the
    * predictor and residual tables are |groups|-sized broadcasts; q-hat
    * comes from a window over each group's DISTINCT residual values
    * (value-compressed, the AUC/KS discipline), never a per-row rank.
    * Returns one row per group: (group, n_train, n_cal, n_test,
    * pred_cents, qhat_cents, coverage_ppm). */
  def splitConformal(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, alphaPct: Int = 10, seed: Int = 41): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100)
    import graft.functions.TextFunctions.hash32
    val base = df.select(col(groupCol).as("g"),
      round(col(valueCol) * 100).cast("bigint").as("cents"),
      (hash32(col(idCol).cast("string"), seed) % 10).as("fold"))
    val preds = base.filter(col("fold") <= 5).groupBy(col("g"))
      .agg(count(lit(1)).as("n_train"), sum(col("cents")).as("_s"))
      .select(col("g"), col("n_train"), expr("_s div n_train").as("pred_cents"))
    val resid = base.filter(col("fold").isin(6, 7))
      .join(broadcast(preds), Seq("g"))
      .groupBy(col("g"), abs(col("cents") - col("pred_cents")).as("r"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col("g")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val qhat = resid
      .withColumn("_cum", sum(col("c")).over(cum))
      .withColumn("n_cal", sum(col("c")).over(whole))
      .withColumn("_k", least(
        expr(s"((n_cal + 1) * ${100 - alphaPct} + 99) div 100"), col("n_cal")))
      .filter(col("_cum") >= col("_k"))
      .groupBy(col("g"))
      .agg(min(col("r")).as("qhat_cents"), min(col("n_cal")).as("n_cal"))
    base.filter(col("fold") >= 8)
      .join(broadcast(preds), Seq("g"))
      .join(broadcast(qhat), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("cents") - col("pred_cents")) <= col("qhat_cents"),
          1L).otherwise(0L)).as("_cov"),
        min(col("n_train")).as("n_train"), min(col("n_cal")).as("n_cal"),
        min(col("pred_cents")).as("pred_cents"),
        min(col("qhat_cents")).as("qhat_cents"))
      .select(col("g").as(groupCol), col("n_train"), col("n_cal"),
        col("n_test"), col("pred_cents"), col("qhat_cents"),
        expr("_cov * 1000000 div n_test").as("coverage_ppm"))
  }
}
