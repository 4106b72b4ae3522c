package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary with `cap` counters.
  *
  * Invariant (the one that survives arbitrary merges, Agarwal et al.,
  * "Mergeable Summaries", PODS'12): for every item x,
  * `true(x) - err <= est(x) <= true(x)`, where `err` is the total
  * decrement applied so far and `err <= N / (cap + 1)` for N processed
  * rows. Hence every item with true frequency > N/(cap+1) has est > 0
  * and is retained — the summary is a guaranteed SUPERSET of the heavy
  * hitters, with O(cap) state regardless of input size or merge order.
  */
final class MisraGriesBuffer(val cap: Int) {
  val counts = new mutable.HashMap[String, Long]
  var err: Long = 0L

  def add(item: String, c: Long): Unit = {
    val cur = counts.getOrElse(item, 0L)
    if (cur > 0L || counts.size < cap) {
      counts.update(item, cur + c)
    } else {
      // full and item absent: decrement everything by min(c, current min)
      // repeatedly — equivalently subtract d = min over the would-be set,
      // here bounded to one step of size min(c, min count) then recurse on
      // the remainder. One-shot closed form: let m = min count; if c < m,
      // subtract c from all and drop nothing but err += c... To stay exact
      // and simple, subtract d = min(c, m) from every counter (dropping
      // zeros) and re-add the remainder of this item if any survives room.
      var rest = c
      while (rest > 0L) {
        if (counts.size < cap) { counts.update(item, counts.getOrElse(item, 0L) + rest); rest = 0L }
        else {
          val m = counts.valuesIterator.min
          val d = math.min(rest, m)
          err += d
          rest -= d
          val dead = counts.iterator.filter(_._2 <= d).map(_._1).toList
          counts.mapValuesInPlace((_, v) => v - d)
          dead.foreach(counts.remove)
        }
      }
    }
  }

  def mergeIn(other: MisraGriesBuffer): Unit = {
    err += other.err
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > cap) {
      // subtract the (cap+1)-th largest count from everything; at most
      // cap survive and the per-item undercount grows by exactly d.
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val d = vs(vs.length - cap - 1) // (cap+1)-th largest
      err += d
      val dead = counts.iterator.filter(_._2 <= d).map(_._1).toList
      counts.mapValuesInPlace((_, v) => v - d)
      dead.foreach(counts.remove)
    }
  }
}

/** freq_items(item, cap): Misra-Gries candidate set over a string column —
  * `array<string>` of every item whose residual estimate is positive,
  * sorted (est desc, item asc). Guaranteed to contain ALL items with true
  * frequency > N/(cap+1); may contain false positives, so pair it with an
  * exact recount of the (<= cap) candidates — the classic two-pass exact
  * heavy-hitters plan whose shuffle never exceeds `partitions × cap` rows,
  * vs the one-pass `groupBy(item)` whose shuffle is the full vocabulary.
  */
case class FrequentItems(
    item: Expression,
    cap: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  private lazy val capVal: Int = cap.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(item, cap)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!cap.foldable) {
      TypeCheckResult.TypeCheckFailure("cap must be a literal")
    } else if (item.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"freq_items expects (string, int), got ${item.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(capVal)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MisraGriesBuffer): Any = {
    val out = buf.counts.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(out.map(kv => UTF8String.fromString(kv._1)))
  }

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.err)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesBuffer(capVal)
    buf.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { val k = in.readUTF(); val v = in.readLong(); buf.counts.update(k, v); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), cap = newChildren(1))
}

object FrequentItems {
  def apply(item: Expression, cap: Int): FrequentItems =
    FrequentItems(item, Literal(cap))
}
