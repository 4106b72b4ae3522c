package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Least-squares trend fitting as mergeable state (OLAP / monitoring
  * extension; declared as q98).
  *
  * The per-group moment sums (n, Σx, Σy, Σxy, Σx²) accumulate EXACTLY in
  * decimal — no float-association drift at any parallelism — and they are
  * a plain aggregation, so the same state maintains incrementally under
  * Structured Streaming (complete/update mode; StreamingMonitorSpec) and
  * merges across partitions, days, or engines by summation. The slope
  * readout is a fixed scalar double expression over the exact sums:
  * order-independent, reproduced bit-for-bit by the DuckDB oracle —
  * unlike a naive double `regr_slope`, whose partial-sum order varies
  * with partitioning.
  *
  * Callers pre-cast: `xCol` a small-magnitude DECIMAL (center epochs to
  * an offset so x² stays inside decimal(38)), `yCol` a DECIMAL of the
  * value's scale.
  */
object Trend {

  /** (group, n, sx, sy, sxy, sxx) — exact decimal moments. */
  def momentSums(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"),
        sum(col(xCol) * col(xCol)).as("sxx"))

  /** Slope per `unitsPerX` x-units (e.g. 86400 for per-day over second
    * x), rounded to `scale` — one deterministic double expression over
    * the exact moments. A group whose x never varies has no defined
    * slope: null, not a NaN/Inf that engines print differently. */
  def slope(moments: DataFrame, groupCol: String,
      unitsPerX: Double, scale: Int): DataFrame = {
    val den = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val num = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    moments.select(col(groupCol), col("n"),
      when(den === 0d, lit(null).cast("double"))
        .otherwise(round(num / den * unitsPerX, scale)).as("slope_per_day"))
  }

  /** All pairwise Pearson correlations of `cols` in ONE pass (the feature
    * correlation matrix a pipeline inspects before training). Every
    * moment — n, Σxᵢ, Σxᵢ², Σxᵢxⱼ for all i<j — accumulates in a single
    * partial-aggregating scan: exact DECIMAL(18,`decScale`) sums, so the
    * result is order-independent at any parallelism and bit-identical to
    * the DuckDB oracle. Shuffle cost is ONE reduce of a single row of
    * k(k+3)/2 + 1 sums regardless of data size; the pair fan-out happens
    * after the agg on that one row. A constant column has no defined
    * correlation: null, never NaN.
    *
    * r(i,j) = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²) · (n·Σyy − Σy²)),
    * evaluated as fixed-order double ops over the exact sums. */
  def corrPairs(df: DataFrame, cols: Seq[String], scale: Int = 6,
      decScale: Int = 4): DataFrame =
    corrFromMoments(corrMoments(df, cols, decScale), cols, scale)

  private def pairsOf(cols: Seq[String]) = for {
    i <- cols.indices; j <- cols.indices if i < j
  } yield (cols(i), cols(j))

  /** The one-row exact moment table (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ). A plain global
    * aggregation, so the SAME state maintains incrementally under
    * Structured Streaming (complete mode) and merges across partitions,
    * days, or engines by summation — the correlation matrix is a live
    * monitor, not only a batch report (StreamingMonitorSpec). */
  def corrMoments(df: DataFrame, cols: Seq[String],
      decScale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    // Listwise-complete: a row with ANY null feature contributes to no
    // moment, keeping n consistent with every sum (pairwise-complete n
    // would differ per pair and silently bias r on nully data).
    val base = df.na.drop(cols)
    val dec = s"decimal(18,$decScale)"
    def s1(c: String) = s"s_$c"
    def s2(a: String, b: String) = s"s_${a}_$b"
    val aggs =
      cols.map(c => sum(col(c).cast(dec)).as(s1(c))) ++
      cols.map(c => sum(col(c).cast(dec) * col(c).cast(dec)).as(s2(c, c))) ++
      pairsOf(cols).map { case (a, b) =>
        sum(col(a).cast(dec) * col(b).cast(dec)).as(s2(a, b))
      }
    base.agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Fixed-order double readout of r(i,j) per pair from the moment row. */
  def corrFromMoments(m: DataFrame, cols: Seq[String],
      scale: Int = 6): DataFrame = {
    def s1(c: String) = s"s_$c"
    def s2(a: String, b: String) = s"s_${a}_$b"
    def d(name: String) = col(name).cast("double")
    val n = d("n")
    val rows = pairsOf(cols).map { case (a, b) =>
      val cov = n * d(s2(a, b)) - d(s1(a)) * d(s1(b))
      val va = n * d(s2(a, a)) - d(s1(a)) * d(s1(a))
      val vb = n * d(s2(b, b)) - d(s1(b)) * d(s1(b))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va === 0d || vb === 0d, lit(null).cast("double"))
          .otherwise(round(cov / sqrt(va * vb), scale)).as("corr"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
  }

  /** DuckDB spelling of [[corrPairs]] over table `tbl` — the same exact
    * moment CTE and the same fixed double readout per pair. Width note:
    * Spark multiplies DECIMAL(18,s) exactly (result 37,2s fits 38), but
    * DuckDB caps an 18×18 multiply at width 18 (int64) and overflows;
    * width 19 forces its INT128 path → exact DECIMAL(38,2s). Same values,
    * engine-appropriate widths. */
  def corrPairsSql(tbl: String, cols: Seq[String], scale: Int = 6,
      decScale: Int = 4): String = {
    def s1(c: String) = s"s_$c"
    def s2(a: String, b: String) = s"s_${a}_$b"
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val dec = s"DECIMAL(19,$decScale)"
    val sums =
      cols.map(c => s"SUM(CAST($c AS $dec)) AS ${s1(c)}") ++
      cols.map(c => s"SUM(CAST($c AS $dec) * CAST($c AS $dec)) AS ${s2(c, c)}") ++
      pairs.map { case (a, b) =>
        s"SUM(CAST($a AS $dec) * CAST($b AS $dec)) AS ${s2(a, b)}"
      }
    def d(name: String) = s"CAST($name AS DOUBLE)"
    val selects = pairs.map { case (a, b) =>
      val cov = s"(${d("n")} * ${d(s2(a, b))} - ${d(s1(a))} * ${d(s1(b))})"
      val va = s"(${d("n")} * ${d(s2(a, a))} - ${d(s1(a))} * ${d(s1(a))})"
      val vb = s"(${d("n")} * ${d(s2(b, b))} - ${d(s1(b))} * ${d(s1(b))})"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  CASE WHEN $va = 0 OR $vb = 0 THEN NULL
         |       ELSE round($cov / sqrt($va * $vb), $scale) END AS corr FROM m""".stripMargin
    }
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    s"""WITH m AS (SELECT count(*) AS n, ${sums.mkString(",\n  ")}
       |  FROM $tbl WHERE $notNull)
       |${selects.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
