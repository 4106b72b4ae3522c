package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (see TESTDATA.md).
  *
  * These stand in for the reference's ScyllaDB tables
  * (`/root/reference/scylladb_setup/create_iot_schema.py`): reads are plain
  * `spark.read.parquet` so Catalyst gets pushdown/pruning for free — the
  * Spark-native replacement for the reference's partition-key point reads.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fixture tables are single-row-group parquet files, so a raw scan is
    * one input split = single-core execution of the whole narrow phase.
    * Re-spread the big tables on their dominant join/group key: the
    * shuffle is tiny, buys full map-side parallelism, and — because the
    * key matches downstream joins/aggregations at shuffle.partitions
    * granularity — Catalyst reuses the partitioning instead of adding an
    * exchange. (At real scale sources have many splits and this is
    * unnecessary — it's a local-fixture artifact.) */
  private val spreadKeys = Map(
    "documents" -> "doc_id", // md5/shingle pipelines: CPU-bound narrow phase
    "events" -> "user_id") // per-user windows reuse the partitioning
  // embeddings intentionally NOT spread (measured: q29 2.3s -> 2.9s, q85
  // 1.4s -> 1.6s under a forced vec_id spread — vector pipelines shuffle
  // on their own keys immediately, so the extra exchange only adds cost;
  // same reasoning as lineitem/orders below).
  // lineitem/orders intentionally NOT spread: their narrow phases are
  // cheap columnar aggregates where the extra shuffle costs more than the
  // single-split scan (measured: q01 0.19s -> 0.43s under a forced spread).

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw =
      if (name == "events") {
        // events.ts has varied across fixture generations: TIMESTAMP(NANOS)
        // (which Spark 4 refuses to read as a timestamp — read as raw nanos
        // via the legacy conf and divide; µs-precision data makes the
        // truncation lossless) or TIMESTAMP(MICROS)/NTZ (cast straight to
        // session-TZ timestamp; session TZ is pinned UTC so the cast is
        // value-preserving). Dispatch on the actual file schema.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df0 = spark.read.parquet(s"$dir/$name.parquet")
        df0.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df0.withColumn("ts",
              org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
          case _ =>
            df0.withColumn("ts",
              org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        }
      } else {
        spark.read.parquet(s"$dir/$name.parquet")
      }
    spreadKeys.get(name) match {
      case Some(key) => raw.repartition(spark.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col(key))
      case None => raw
    }
  }

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
