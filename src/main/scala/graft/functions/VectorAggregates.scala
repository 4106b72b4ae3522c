package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mutable centroid buffer: element-wise sums + row count. */
case class CentroidBuffer(sums: Array[Double], var n: Long)

/** vector_centroid: element-wise mean of vectors — the reference's profile
  * centroid `np.mean(embeddings, axis=0)`
  * (`/root/reference/pipeline/build_profiles.py:90-105`) as a typed Spark
  * `Aggregator` with map-side partial aggregation (one O(dim) buffer per
  * partition, so profile builds over 100 TB of snapshots shuffle only
  * `partitions × devices × dim` doubles).
  */
object VectorCentroid extends Aggregator[Seq[Double], CentroidBuffer, Seq[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(Array.emptyDoubleArray, 0L)

  private def add(b: CentroidBuffer, v: Array[Double]): CentroidBuffer = {
    if (v.isEmpty) return b
    val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    val n = math.min(sums.length, v.length)
    while (i < n) { sums(i) += v(i); i += 1 }
    CentroidBuffer(sums, b.n + 1)
  }

  override def reduce(b: CentroidBuffer, a: Seq[Double]): CentroidBuffer =
    if (a == null) b else add(b, a.toArray)

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val sums = a.sums.clone()
    var i = 0
    val n = math.min(sums.length, b.sums.length)
    while (i < n) { sums(i) += b.sums(i); i += 1 }
    CentroidBuffer(sums, a.n + b.n)
  }

  override def finish(b: CentroidBuffer): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
