package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass sorted-distinct-set aggregate over BIGINT keys: the fused form of
  * `sort_array(collect_set(x))` (SURVEY §7's "optional nicety").
  *
  * `collect_set` accumulates an unordered hash set and `sort_array` then
  * copies + sorts the finished array per group; this aggregate keeps the
  * buffer sorted as it goes (TreeSet), so the final array materializes in
  * order with no second pass. Registered as SQL function `sorted_set_agg`
  * and auto-substituted for the two-step form by
  * [[RewriteSortedCollectSet]] when [[graft.GraftExtensions]] is installed.
  *
  * Reference semantics anchor: posting lists are distinct sorted doc ids
  * (reference src/main.cpp:188-191 dedup + :234-236 sort).
  */
case class SortedDistinctSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b1 ++= b2
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_set_agg requires BIGINT input, got ${child.dataType.catalogString}")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_set_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedDistinctSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedDistinctSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SortedDistinctSetAgg =
    copy(child = newChild)
}
