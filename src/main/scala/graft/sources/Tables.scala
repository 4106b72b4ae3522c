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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
