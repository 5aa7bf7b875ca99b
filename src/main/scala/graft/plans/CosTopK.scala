package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate for similarity search: keeps only the k best
  * (key DESC, id ASC) entries in its buffer at every point, so the PARTIAL
  * aggregation on the map side already caps each (group × partition)
  * contribution at k rows before the exchange.
  *
  * This is the scale fix for brute-force cosine top-k: the naive
  * `row_number() OVER (PARTITION BY q_id ...)` plan shuffles the entire
  * corpus×queries pair stream and collapses parallelism to |Q| tasks; with
  * this aggregate the exchange moves ≤ k·|Q|·numPartitions tiny structs and
  * the merge is a k-way list merge per query.
  *
  * Children: (key: DOUBLE sort key — pass the 6-dp portably-rounded cosine
  * for cross-engine rank stability; id: BIGINT tie-break; cos: DOUBLE raw
  * payload). Result: array<struct<id,cos>> in rank order (posexplode for
  * 1-based ranks).
  */
case class CosTopK(
    key: Expression,
    id: Expression,
    cos: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[CosTopK.Entry]]
  with TernaryLike[Expression] {

  import CosTopK.Entry

  require(k > 0, s"cos_topk requires k > 0, got $k")

  override def first: Expression  = key
  override def second: Expression = id
  override def third: Expression  = cos

  override def createAggregationBuffer(): mutable.ArrayBuffer[Entry] =
    mutable.ArrayBuffer.empty[Entry]

  /** (key DESC, id ASC) — true iff a ranks strictly before b. */
  @inline private def before(a: Entry, b: Entry): Boolean =
    a.key > b.key || (a.key == b.key && a.id < b.id)

  /** Sorted insert + trim: O(k) per row, buffer NEVER exceeds k entries. */
  private def insert(buf: mutable.ArrayBuffer[Entry], e: Entry): Unit = {
    if (buf.size >= k && !before(e, buf.last)) return
    var i = buf.size
    while (i > 0 && before(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: mutable.ArrayBuffer[Entry], input: InternalRow): mutable.ArrayBuffer[Entry] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    val cv = cos.eval(input)
    if (kv != null && iv != null && cv != null) {
      insert(buf, Entry(kv.asInstanceOf[Double], iv.asInstanceOf[Long], cv.asInstanceOf[Double]))
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[Entry], b2: mutable.ArrayBuffer[Entry]): mutable.ArrayBuffer[Entry] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Entry]): Any =
    new GenericArrayData(buf.map(e => new GenericInternalRow(Array[Any](e.id, e.cos))).toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { e => bb.putDouble(e.key); bb.putLong(e.id); bb.putDouble(e.cos) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Entry] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = mutable.ArrayBuffer.empty[Entry]
    var i = 0
    while (i < n) { buf += Entry(bb.getDouble(), bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("cos", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == DoubleType && id.dataType == LongType && cos.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cos_topk requires (DOUBLE, BIGINT, DOUBLE), got " +
          s"(${key.dataType.catalogString}, ${id.dataType.catalogString}, ${cos.dataType.catalogString})")
    }

  override def nullable: Boolean = false
  override def prettyName: String = "cos_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): CosTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CosTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression, newThird: Expression): CosTopK =
    copy(key = newFirst, id = newSecond, cos = newThird)
}

object CosTopK {
  final case class Entry(key: Double, id: Long, cos: Double)
}
