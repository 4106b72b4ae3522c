package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — the model-comparison table marketing/growth
  * actually argues about: for each conversion, credit its preceding
  * touches under THREE models at once (last-touch, linear, U-shaped
  * 40/20/40) and roll credit up per channel. q217 answers "how long
  * before purchase was the last view?"; this answers "which channel gets
  * the revenue?" under each rule, side by side.
  *
  * Semantics: per user, events form one (ts, event_id)-ordered sequence;
  * a conversion's touch window is the non-conversion events AMONG the
  * `maxTouches` immediately preceding events of any type (row-based —
  * the bounded-fanout discipline: the join can never explode past
  * maxTouches rows per conversion; an interleaved conversion consumes a
  * window slot, shrinking that window's effective touch set).
  * Conversions with no touch in window are dropped (unattributable).
  * Credit is split in integer MILLI of each conversion's cents:
  *   - last:   1000 to the latest touch;
  *   - linear: 1000 div k each, remainder to the latest touch;
  *   - ushape: k=1 → 1000; k=2 → 500/500; else 400 first, 400 last,
  *             200 div (k−2) per middle, remainder to the latest.
  * Every split sums to exactly 1000, so each model conserves total
  * credited revenue; the one floor-division per channel happens at
  * readout. Engine-exact end to end.
  *
  * Scale shape: one sequence window per user (the fact's natural
  * partitioning), an equi-join on user with a row-index band (≤
  * maxTouches fanout), two keyed aggregations. Returns
  * (channel, n_touches, last_cents, linear_cents, ushape_cents). */
object Attribution {

  def modelComparison(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      conversionType: String = "purchase", maxTouches: Int = 10): DataFrame = {
    require(maxTouches >= 1)
    val seq = events.select(col(userCol).as("u"), col(typeCol).as("ch"),
        round(col(valueCol) * 100).cast("bigint").as("cents"),
        row_number().over(Window.partitionBy(col(userCol))
          .orderBy(col(tsCol), col(idCol))).cast("long").as("i"))
    val conv = seq.filter(col("ch") === conversionType)
      .select(col("u"), col("i").as("pi"), col("cents"))
    val touch = seq.filter(col("ch") =!= conversionType)
      .select(col("u"), col("i").as("ti"), col("ch"))
    val j = conv.join(touch,
      conv("u") === touch("u") &&
        col("ti") >= col("pi") - maxTouches && col("ti") <= col("pi") - 1)
      .select(conv("u"), col("pi"), col("cents"), col("ti"), col("ch"))
    val grp = j.groupBy(col("u").as("gu"), col("pi").as("gpi"))
      .agg(count(lit(1)).as("k"), min(col("ti")).as("first_ti"),
        max(col("ti")).as("last_ti"))
    val w = j.join(grp, col("u") === col("gu") && col("pi") === col("gpi"))
      .withColumn("w_last",
        when(col("ti") === col("last_ti"), 1000L).otherwise(0L))
      .withColumn("w_linear",
        expr("1000 div k") +
          when(col("ti") === col("last_ti"),
            expr("1000 - k * (1000 div k)")).otherwise(0L))
      .withColumn("w_ushape",
        when(col("k") === 1, 1000L)
          .when(col("k") === 2, 500L)
          .when(col("ti") === col("first_ti"), 400L)
          .when(col("ti") === col("last_ti"),
            lit(400L) + expr("200 - (k - 2) * (200 div (k - 2))"))
          .otherwise(expr("200 div (k - 2)")))
    w.groupBy(col("ch").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("cents") * col("w_last")).as("_l"),
        sum(col("cents") * col("w_linear")).as("_n"),
        sum(col("cents") * col("w_ushape")).as("_u"))
      .select(col("channel"), col("n_touches"),
        expr("_l div 1000").as("last_cents"),
        expr("_n div 1000").as("linear_cents"),
        expr("_u div 1000").as("ushape_cents"))
  }
}
