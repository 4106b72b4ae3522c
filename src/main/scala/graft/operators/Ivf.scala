package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim

/** Trained IVF (inverted-file) approximate nearest-neighbor index.
  *
  * The production-shaped version of q27's label-cell skeleton and the 100 TB
  * replacement for the reference's HNSW index
  * (`/root/reference/scylladb_setup/create_iot_schema.py:136-155`): k-means
  * coarse cells over the corpus; search probes only the `nprobe` cells
  * whose centroids are nearest the query. On a cluster the assigned corpus
  * is partitioned (or bucketed) by cell_id, so a probe touches `nprobe/k`
  * of the data — the same pruning HNSW gets from its graph, but expressed
  * as partition pruning that Spark already knows how to scale.
  *
  * Vectors are L2-normalized before clustering so Euclidean k-means cells
  * approximate cosine cells (standard spherical-IVF trick).
  */
object Ivf {

  /** cells: (cell_id int, centroid array<double>);
    * assigned: corpus + cell_id (partitionable/bucketable by cell_id). */
  case class IvfIndex(cells: DataFrame, assigned: DataFrame)

  def build(
      corpus: DataFrame, nCells: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val normed = corpus.withColumn("_nvec",
      graft.functions.GraftFunctions.l2_normalize(col(vecCol)))
    val feats = normed.withColumn("_features", array_to_vector(col("_nvec")))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(feats)
    val assigned = model.transform(feats)
      .withColumnRenamed("_cell", "cell_id")
      .drop("_features", "_nvec")
    val cells = assigned.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cell_id", "centroid")
    IvfIndex(cells, assigned)
  }

  /** Approximate top-k by cosine: probe the `nprobe` nearest cells per
    * query, exact-rescore only their members. Returns the standard
    * [query_id, rk, neighbor_id, sim] kNN shape. */
  def search(
      index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qvec"))
    val probed = q.crossJoin(broadcast(index.cells))
      .withColumn("_csim", cosine_sim(col("_qvec"), col("centroid")))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_csim").desc, col("cell_id").asc)))
      .filter(col("_crk") <= nprobe)
      .select(col("query_id"), col("_qvec"), col("cell_id"))
    val pairs = probed
      .join(index.assigned.select(col("cell_id"),
        col(idCol).as("neighbor_id"), col(vecCol).as("_nvec")), Seq("cell_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("_sim", cosine_sim(col("_qvec"), col("_nvec")))
    Knn.reduceTopK(pairs, k)
  }
}
