package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared-operator registry: one entry per implemented
  * operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q.QueryFn], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracleSql),
    (Vectors.queries, Vectors.oracleSql),
    (Events.queries, Events.oracleSql),
    (Documents.queries, Documents.oracleSql),
    (Extras.queries, Extras.oracleSql),
    (TrainingOps.queries, TrainingOps.oracleSql),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q25_path2_centroid_anomaly")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
