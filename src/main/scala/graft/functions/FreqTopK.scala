package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters — ClickHouse's `topK()` analog — as a
  * native `TypedImperativeAggregate`: a bounded-memory Misra–Gries
  * summary per group, merged with the Agarwal et al. ("Mergeable
  * Summaries", PODS'12) rule, so the whole aggregation is ONE pass
  * with `capacity` counters per group at any input size — where exact
  * top-k by `groupBy(item).count` pays a full shuffle on the item key
  * and a hash-aggregate sized by the item CARDINALITY. At 100 TB the
  * summary rides the existing partial-aggregation machinery: partials
  * are `capacity`-bounded byte buffers, never cardinality-sized maps.
  *
  * Guarantees (what the precision oracle re-checks per emitted row):
  *  - underestimate only: `est(x) <= true(x)` — counters only gain on
  *    real occurrences; decrements lose them;
  *  - bounded error: `true(x) - est(x) <= n / (capacity + 1)` where
  *    `n` is the group's row count — each decrement step destroys
  *    `capacity + 1` occurrence credits (the arriving item plus
  *    `capacity` counters), so at most `n/(capacity+1)` such steps
  *    can touch any one item; the merge-time subtraction of the
  *    (capacity+1)-th largest counter preserves the same accounting;
  *  - completeness: any item with `true(x) > n/(capacity+1)` holds a
  *    counter (its est is positive after all possible decrements), so
  *    true heavy hitters are never absent (spec-tested on a skewed
  *    fixture; per-run emitted SETS below the guarantee line may vary
  *    with merge order, which is why the driver oracle is a
  *    precision-style re-check of the claims, not a fixed value set).
  */
case class FreqTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"freq_topk: k must be >= 1, got $k")
  require(capacity >= k, s"freq_topk: capacity ($capacity) must be >= k ($k)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqTopK.resultType
  override def prettyName: String = "freq_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_topk requires a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // classical MG step: the arriving item and every counter each
          // give up one credit; zeroed counters free their slot
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (item, c) =>
            if (c == 1L) dead += item else buf.update(item, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) => a.update(item, a.getOrElse(item, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all — the
      // mergeable-summaries rule; <= 0 counters free their slots
      val sub = a.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (item, c) =>
        if (c - sub <= 0L) dead += item else a.update(item, c - sub)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (item, est) => (-est, item) }.take(k)
    new GenericArrayData(top.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqTopK =
    copy(child = newChildren.head)
}

object FreqTopK {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  /** Column-API entry point: `df.groupBy(...).agg(FreqTopK.topK(col, 5, 32))`. */
  def topK(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      new FreqTopK(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
