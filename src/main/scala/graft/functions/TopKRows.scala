package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k best rows under an arbitrary row ordering,
  * worst-first binary heap. Rows are (sort-key values ++ payload values);
  * `ord` compares the key prefix with full Spark SortOrder semantics
  * (direction, null ordering, NaN total order per key), so ranking matches
  * the `row_number` window the aggregate replaces exactly — including
  * multi-key tie-breaks. Among fully-equal keys order is arbitrary, the
  * same contract as `row_number`. Used by [[TopKRows]]. */
final class RowTopKBuffer(val k: Int, ord: Ordering[InternalRow]) {
  val rows = new Array[InternalRow](math.max(k, 0))
  var size: Int = 0

  // "a is worse than b": a would be ranked after b by the window sort.
  @inline private def worse(a: InternalRow, b: InternalRow): Boolean =
    ord.compare(a, b) > 0

  /** Would a row comparing like `keyRow` be kept? Callers pass a keys-only
    * row (the ordering reads only the key prefix) to skip materializing
    * the payload for the (common) rejected case. */
  @inline def wouldAdmit(keyRow: InternalRow): Boolean =
    size < k || (k > 0 && worse(rows(0), keyRow))

  def insert(row: InternalRow): Unit = {
    if (size < k) {
      var i = size; rows(i) = row; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(rows(i), rows(p))) {
          val t = rows(i); rows(i) = rows(p); rows(p) = t
          i = p
        } else return
      }
    } else if (k > 0 && worse(rows(0), row)) {
      rows(0) = row
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(rows(l), rows(w))) w = l
        if (r < size && worse(rows(r), rows(w))) w = r
        if (w == i) continue = false
        else {
          val t = rows(i); rows(i) = rows(w); rows(w) = t
          i = w
        }
      }
    }
  }

  /** rows sorted best-first (stable order not guaranteed for fully-equal
    * keys — same contract as row_number over ties). */
  def sortedRows: Array[InternalRow] = {
    val out = new Array[InternalRow](size)
    System.arraycopy(rows, 0, out, 0, size)
    java.util.Arrays.sort(out, ord)
    out
  }
}

/** top_k_rows(keys..., payload...): keeps the k payload rows ranked best by
  * the sort-key tuple and returns them best-first as
  * `array<struct<payload...>>`.
  *
  * The generalized sibling of [[TopKByScore]]: any number of sort keys of
  * any orderable type (each with its own direction and null ordering —
  * exactly a window's `ORDER BY` list), arbitrary payload columns riding
  * along. A `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` pattern
  * becomes a bounded aggregate — O(k) state per group with map-side partial
  * aggregation — instead of a full shuffle + sort of every candidate row
  * (see [[graft.plans.GroupedTopKRewrite]]). Ranking delegates to
  * [[InterpretedOrdering]], so null / NaN / multi-key tie semantics are the
  * window sort's own.
  */
case class TopKRows(
    keys: Seq[Expression],
    ascending: Seq[Boolean],
    nullsFirstFlags: Seq[Boolean],
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RowTopKBuffer] {

  override def children: Seq[Expression] = keys ++ payload

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = keys.filterNot(kx => RowOrdering.isOrderable(kx.dataType))
    if (keys.isEmpty)
      TypeCheckResult.TypeCheckFailure("top_k_rows needs at least one sort key")
    else if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_rows sort keys must be orderable, got " +
          bad.map(_.dataType.catalogString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  private def nKeys: Int = keys.length

  private lazy val payloadSchema = StructType(payload.zipWithIndex.map {
    case (e, i) => StructField(s"c$i", e.dataType, e.nullable)
  })
  override def dataType: DataType = ArrayType(payloadSchema, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  @transient private lazy val ord: Ordering[InternalRow] = {
    val sortOrders = keys.zipWithIndex.map { case (kx, i) =>
      SortOrder(
        BoundReference(i, kx.dataType, kx.nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirstFlags(i)) NullsFirst else NullsLast,
        Seq.empty)
    }
    new InterpretedOrdering(sortOrders)
  }

  @transient private lazy val serProj = UnsafeProjection.create(
    (keys.map(_.dataType) ++ payload.map(_.dataType)).toArray)

  override def createAggregationBuffer(): RowTopKBuffer = new RowTopKBuffer(k, ord)

  override def update(buf: RowTopKBuffer, input: InternalRow): RowTopKBuffer = {
    // keys evaluated first into a keys-only probe row; the ordering reads
    // only the key prefix, so admission is decided before the payload is
    // ever materialized.
    val keyVals = keys.map(e => InternalRow.copyValue(e.eval(input)))
    val probe = InternalRow.fromSeq(keyVals)
    if (buf.wouldAdmit(probe)) {
      val vals = payload.map(e => InternalRow.copyValue(e.eval(input)))
      buf.insert(InternalRow.fromSeq(keyVals ++ vals))
    }
    buf
  }

  override def merge(buf: RowTopKBuffer, other: RowTopKBuffer): RowTopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.rows(i)); i += 1 }
    buf
  }

  /** Best-first payload rows (keys stripped), truncated to k. */
  override def eval(buf: RowTopKBuffer): Any = {
    val out = buf.sortedRows.map { r =>
      InternalRow.fromSeq(payload.indices.map(j =>
        r.get(nKeys + j, payload(j).dataType))): Any
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: RowTopKBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      val u = serProj(buf.rows(i))
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RowTopKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new RowTopKBuffer(k, ord)
    val width = nKeys + payload.length
    val types = keys.map(_.dataType) ++ payload.map(_.dataType)
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val arr = new Array[Byte](sz)
      in.readFully(arr)
      val u = new UnsafeRow(width)
      u.pointTo(arr, sz)
      val vals = (0 until width).map(j => u.get(j, types(j)))
      buf.insert(InternalRow.fromSeq(vals).copy())
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
    copy(keys = newChildren.take(nKeys), payload = newChildren.drop(nKeys))
}
