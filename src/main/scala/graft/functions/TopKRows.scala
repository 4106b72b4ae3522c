package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k best (score, payload-row) pairs, worst-first
  * binary heap, plus a side buffer of up to k null-score rows (their rank
  * relative to non-null rows is decided at eval time by the null ordering;
  * among themselves nulls are order-equal, so keeping an arbitrary k
  * matches the `row_number` tie contract). Used by [[TopKRows]]. */
final class RowTopKBuffer(val k: Int, val asc: Boolean) {
  val scores = new Array[Double](k)
  val rows = new Array[InternalRow](k)
  var size: Int = 0
  val nullRows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

  /** Admit a null-score row (capped at k — more can never be ranked). */
  def insertNull(row: InternalRow): Unit =
    if (nullRows.length < k) nullRows += row

  // "a is worse than b": for desc ranking lower score is worse; asc inverts.
  // java.lang.Double.compare gives Spark's total order over doubles (NaN
  // sorts greater than any value) — plain </> would never admit NaN and
  // break the heap invariant once one is present.
  @inline private def worse(a: Double, b: Double): Boolean =
    if (asc) java.lang.Double.compare(a, b) > 0
    else java.lang.Double.compare(a, b) < 0

  /** Would a row with this score be kept? Callers use this to skip
    * materializing the payload for the (common) rejected case. */
  @inline def wouldAdmit(s: Double): Boolean =
    size < k || (k > 0 && worse(scores(0), s))

  def insert(s: Double, row: InternalRow): Unit = {
    if (size < k) {
      var i = size; scores(i) = s; rows(i) = row; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), scores(p))) {
          val ts = scores(i); scores(i) = scores(p); scores(p) = ts
          val tr = rows(i); rows(i) = rows(p); rows(p) = tr
          i = p
        } else return
      }
    } else if (k > 0 && worse(scores(0), s)) {
      scores(0) = s; rows(0) = row
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(scores(l), scores(w))) w = l
        if (r < size && worse(scores(r), scores(w))) w = r
        if (w == i) continue = false
        else {
          val ts = scores(i); scores(i) = scores(w); scores(w) = ts
          val tr = rows(i); rows(i) = rows(w); rows(w) = tr
          i = w
        }
      }
    }
  }

  /** rows sorted best-first (stable order not guaranteed for equal scores —
    * same contract as row_number over ties). */
  def sortedRows: Array[InternalRow] = {
    val idx = Array.tabulate(size)(identity)
    val sorted = idx.sortWith((a, b) =>
      if (asc) java.lang.Double.compare(scores(a), scores(b)) < 0
      else java.lang.Double.compare(scores(a), scores(b)) > 0)
    sorted.map(rows)
  }
}

/** top_k_rows(score, k, asc, payload...): keeps the k payload rows with the
  * best score and returns them best-first as array<struct<payload...>>.
  *
  * The generalized sibling of [[TopKByScore]]: arbitrary payload columns
  * ride along, so a `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
  * pattern can be computed as a bounded aggregate — O(k) state per group
  * with map-side partial aggregation — instead of a full shuffle + sort of
  * every candidate row (see [[graft.plans.GroupedTopKRewrite]]).
  *
  * `nullsFirst` replicates the window SortOrder's null ordering: true means
  * null scores rank before every non-null score (Spark's default for asc),
  * false ranks them after (default for desc). NaN follows Spark's total
  * order: greater than every other double.
  */
case class TopKRows(
    score: Expression,
    payload: Seq[Expression],
    k: Int,
    asc: Boolean,
    nullsFirst: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RowTopKBuffer] {

  override def children: Seq[Expression] = score +: payload

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_rows score must be double, got ${score.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val payloadSchema = StructType(payload.zipWithIndex.map {
    case (e, i) => StructField(s"c$i", e.dataType, e.nullable)
  })
  override def dataType: DataType = ArrayType(payloadSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  @transient private lazy val serProj = UnsafeProjection.create(
    (DoubleType +: payload.map(_.dataType)).toArray)

  override def createAggregationBuffer(): RowTopKBuffer = new RowTopKBuffer(k, asc)

  override def update(buf: RowTopKBuffer, input: InternalRow): RowTopKBuffer = {
    val s = score.eval(input)
    if (s == null) {
      if (buf.nullRows.length < k) {
        val vals = payload.map(e => InternalRow.copyValue(e.eval(input)))
        buf.insertNull(InternalRow.fromSeq(vals))
      }
    } else if (buf.wouldAdmit(s.asInstanceOf[Double])) {
      // payload is materialized ONLY for admitted rows; deep-copy values
      // since eval results may be views into reused buffers
      val vals = payload.map(e => InternalRow.copyValue(e.eval(input)))
      buf.insert(s.asInstanceOf[Double], InternalRow.fromSeq(vals))
    }
    buf
  }

  override def merge(buf: RowTopKBuffer, other: RowTopKBuffer): RowTopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.rows(i)); i += 1 }
    other.nullRows.foreach(buf.insertNull)
    buf
  }

  /** Best-first rows under the full SortOrder semantics: null-score rows
    * take the leading ranks when `nullsFirst`, the trailing ranks
    * otherwise; total output truncated to k. */
  override def eval(buf: RowTopKBuffer): Any = {
    val nonNull = buf.sortedRows
    val all =
      if (nullsFirst) buf.nullRows.iterator ++ nonNull.iterator
      else nonNull.iterator ++ buf.nullRows.iterator
    new GenericArrayData(all.take(k).map(_.asInstanceOf[Any]).toArray)
  }

  override def serialize(buf: RowTopKBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      val joined = InternalRow.fromSeq(
        (buf.scores(i) +: (0 until payload.length).map(j =>
          buf.rows(i).get(j, payload(j).dataType))).toIndexedSeq)
      val u = serProj(joined)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
      i += 1
    }
    out.writeInt(buf.nullRows.length)
    buf.nullRows.foreach { r =>
      val joined = InternalRow.fromSeq(
        (0.0d +: (0 until payload.length).map(j =>
          r.get(j, payload(j).dataType))).toIndexedSeq)
      val u = serProj(joined)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RowTopKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new RowTopKBuffer(k, asc)
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val arr = new Array[Byte](sz)
      in.readFully(arr)
      val u = new UnsafeRow(1 + payload.length)
      u.pointTo(arr, sz)
      val s = u.getDouble(0)
      val vals = (0 until payload.length).map(j => u.get(j + 1, payload(j).dataType))
      buf.insert(s, InternalRow.fromSeq(vals).copy())
      i += 1
    }
    val nNull = in.readInt()
    i = 0
    while (i < nNull) {
      val sz = in.readInt()
      val arr = new Array[Byte](sz)
      in.readFully(arr)
      val u = new UnsafeRow(1 + payload.length)
      u.pointTo(arr, sz)
      val vals = (0 until payload.length).map(j => u.get(j + 1, payload(j).dataType))
      buf.insertNull(InternalRow.fromSeq(vals).copy())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren.head, payload = newChildren.tail)
}
