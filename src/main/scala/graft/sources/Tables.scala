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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
      // as a timestamp. Read it as raw nanos (legacy conf) and convert with
      // exact integer division — the driver data is micro-precision, so the
      // ns→µs truncation is lossless.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else if (name == "documents") {
      // One small parquet file = one input split = single-core execution for
      // the md5-heavy text pipelines. Re-spread by doc_id: the shuffle is
      // tiny and buys full parallelism. (At real scale the source has many
      // splits and this is unnecessary — it's a local-fixture artifact.)
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.repartition(spark.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col("doc_id"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
