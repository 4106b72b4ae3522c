package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Multimodal}
import Q._

/** Declared queries without a SQL-expressible oracle (the driver records a
  * rows-only check): approximate-ANN and multimodal operators whose
  * semantics are validated structurally in ScalaTest instead
  * (KnnSpec recall bounds, MultimodalSpec determinism).
  */
object Extras {

  val queries: Map[String, QueryFn] = Map(
    // LSH-approximate kNN (the 100 TB ANN path): sign-random-projection
    // Hamming prefilter + exact rescoring. Oracle omitted: approximate
    // results are validated by recall tests, not row equality.
    "q28_lsh_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Knn.approxLsh(e, e.filter(col("vec_id") < 10), k = 5,
          dim = 64, nBits = 16, hammingRadius = 6)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),

    // Multimodal feature extraction: binary payload columns → fixed-dim
    // features via per-partition decoder (stubbed decode; real plumbing).
    "q60_media_features" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("meta_width"), col("meta_height"), col("decode_ok"))
        .orderBy(col("media_id"))
    }),

    // Multimodal + vector search composition: nearest media assets by
    // stub-feature cosine (shows media features flow into the ANN core).
    "q61_media_knn" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(t(s, dir, "documents"))
      val f = Multimodal.extractFeatures(media).toDF()
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Knn.exact(f, f.filter(col("vec_id") < 5), k = 3)
        .select(col("query_id"), col("rk").cast("bigint").as("rk"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("query_id"), col("rk"))
    }),
  )

  val oracleSql: Map[String, String] = Map.empty
}
