package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregation buffer for [[SortedDistinctSetAgg]]: a growable PRIMITIVE
  * long array with amortized sort+dedup compaction.
  *
  * The previous buffer was a `mutable.TreeSet[Long]` — every insert boxed
  * the key and rebalanced the tree, and the rewrite rule substitutes this
  * aggregate into every `sort_array(collect_set(bigint))` including the
  * flagship index build, so that per-token cost sat on the hottest path in
  * the engine. Here inserts are a plain append; when the array fills we
  * sort + dedup in place (`compact`) and only grow if still over half
  * full — duplicate-heavy streams (token postings: one entry per word
  * OCCURRENCE, deduped to per-document ids) stay small without ever
  * allocating per element, and all-distinct streams pay an amortized
  * O(log n) per insert. The final array is materialized sorted exactly
  * once, at serialize/eval.
  */
final class SortedLongBuffer(initialCapacity: Int = 64) {
  private var arr: Array[Long] = new Array[Long](initialCapacity)
  private var n: Int = 0
  // arr[0, sortedN) is known sorted+distinct; [sortedN, n) is raw appends
  private var sortedN: Int = 0

  def add(v: Long): Unit = {
    if (n == arr.length) {
      compact()
      // still mostly distinct after dedup: double so appends stay O(1)
      if (n > (arr.length >> 1)) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    }
    arr(n) = v
    n += 1
  }

  def addAll(other: SortedLongBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.arr(i)); i += 1 }
  }

  /** Sort + dedup arr[0, n) in place. */
  def compact(): Unit = {
    if (sortedN == n) return
    java.util.Arrays.sort(arr, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    n = w
    sortedN = w
  }

  def size: Int = { compact(); n }

  /** Sorted distinct contents, exact-size copy. */
  def result(): Array[Long] = {
    compact()
    java.util.Arrays.copyOf(arr, n)
  }

  def writeTo(bb: ByteBuffer): Unit = {
    compact()
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(arr(i)); i += 1 }
  }

  def serializedSize: Int = { compact(); 4 + 8 * n }
}

object SortedLongBuffer {
  def readFrom(bb: ByteBuffer): SortedLongBuffer = {
    val n   = bb.getInt()
    val buf = new SortedLongBuffer(math.max(n, 1))
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }
}

/** One-pass sorted-distinct-set aggregate over BIGINT keys: the fused form of
  * `sort_array(collect_set(x))` (SURVEY §7's "optional nicety").
  *
  * `collect_set` accumulates an unordered hash set of boxed values and
  * `sort_array` then copies + sorts the finished array per group; this
  * aggregate appends into a primitive long buffer and sorts + dedups on
  * compaction, so the final array materializes in order with no boxing and
  * no second pass. Registered as SQL function `sorted_set_agg` and
  * auto-substituted for the two-step form by [[RewriteSortedCollectSet]]
  * when [[graft.GraftExtensions]] is installed.
  *
  * Reference semantics anchor: posting lists are distinct sorted doc ids
  * (reference src/main.cpp:188-191 dedup + :234-236 sort).
  */
case class SortedDistinctSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortedLongBuffer]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): SortedLongBuffer = new SortedLongBuffer()

  override def update(buf: SortedLongBuffer, input: InternalRow): SortedLongBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: SortedLongBuffer, b2: SortedLongBuffer): SortedLongBuffer = {
    b1.addAll(b2)
    b1
  }

  override def eval(buf: SortedLongBuffer): Any = new GenericArrayData(buf.result())

  override def serialize(buf: SortedLongBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.serializedSize)
    buf.writeTo(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SortedLongBuffer =
    SortedLongBuffer.readFrom(ByteBuffer.wrap(bytes))

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
