package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score desc, id asc).
  *
  * Backing store is a binary min-heap keyed by "worst first" so insertion
  * beyond capacity evicts the current worst in O(log k).
  */
final class TopKBuffer(val k: Int) {
  // parallel heap arrays; heap(0) is the WORST kept entry
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  // "a is worse than b" under (score desc, id asc) ranking.
  // Double.compare gives a total order (plain </== would never admit NaN
  // once full and break the heap invariant if one slipped in while
  // filling); -0.0 is canonicalized to 0.0 at insert so zero scores stay
  // an id-tiebroken tie, matching SQL ordering semantics.
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  def insert(s0: Double, id: Long): Unit = {
    val s = s0 + 0.0 // -0.0 -> 0.0; NaN/others unchanged
    if (size < k) {
      var i = size; scores(i) = s; ids(i) = id; size += 1
      while (i > 0) { // sift up (parent must be worse)
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else return
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      while (true) { // sift down: move the new entry toward the leaves
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) return
        val ts = scores(i); scores(i) = scores(w); scores(w) = ts
        val ti = ids(i); ids(i) = ids(w); ids(w) = ti
        i = w
      }
    }
  }

  /** (score, id) pairs sorted best-first. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
  }
}

/** top_k_by_score(score, id, k): aggregate keeping the k (score, id) pairs
  * with the highest score (ties broken by lower id), returned best-first as
  * array<struct<score double, id bigint>>.
  *
  * This is the scale-critical piece of the k-NN join (SURVEY §2.5 W1): a
  * bounded O(k) buffer with map-side partial aggregation, so a top-k over
  * an arbitrarily large corpus shuffles only `partitions × queries × k`
  * rows — unlike a global `row_number()` window, which shuffles the whole
  * `|queries| × |corpus|` similarity matrix.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, k)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!k.foldable) {
      TypeCheckResult.TypeCheckFailure("k must be a literal")
    } else if (score.dataType != DoubleType || id.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint, int), got " +
          s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(kVal)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) => InternalRow(s, i) })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(kVal)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object TopKByScore {
  def apply(score: Expression, id: Expression, k: Int): TopKByScore =
    TopKByScore(score, id, Literal(k))
}
