package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bottom-k ROW sample: keep the `k` rows whose
  * (hash60(key), value) pairs are smallest — a uniform fixed-size sample
  * of the row multiset (min-wise / bottom-k sampling, Cohen & Kaplan,
  * "Summarizing data using bottom-k sketches", PODC 2007) that is
  * MERGEABLE (union, keep k smallest — associative, commutative) and
  * fully DETERMINISTIC, because bottom-k of a fixed hash depends on
  * neither arrival nor merge order. The engine's third mergeable sketch
  * family: KMV answers "how many distinct", SpaceSaving/CMS answer "which
  * keys are heavy / how often", this answers "what does the VALUE
  * DISTRIBUTION look like" — sort the k sampled values and read any
  * quantile off the sample, per group, in one partial-agg pass with
  * k-bounded state.
  *
  * [[KmvSketch]] differences, both deliberate: the hash key is a
  * caller-supplied UNIQUE row key (a doc id), not the sampled value, so
  * duplicate VALUES keep their multiplicity (quantiles are over the
  * multiset — KMV's distinct-hash dedup would collapse them); and ties
  * on the hash keep BOTH rows ordered by value (the tiebreak makes even
  * a duplicated row key replay identically cross-engine).
  *
  * Exactly SQL-replayable: hash60 is the KMV construction
  * (`('0x' || substr(md5(key), 1, 15))::BIGINT`), so the oracle's
  * `QUALIFY row_number() OVER (ORDER BY h, v) <= k` retains the
  * IDENTICAL rows — sample, and therefore every quantile estimate,
  * matches bit-for-bit even in eviction mode.
  */
final class BottomKSample(val k: Int) {
  // max-heap on (h, v) — head is the LARGEST retained pair, the one the
  // next smaller arrival evicts; duplicates allowed (multiset semantics)
  val heap = new java.util.PriorityQueue[Array[Long]](
    math.max(1, k),
    new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(b(0), a(0))
        if (c != 0) c
        else java.lang.Double.compare(
          java.lang.Double.longBitsToDouble(b(1)), java.lang.Double.longBitsToDouble(a(1)))
      }
    })

  private def pair(h: Long, v: Double): Array[Long] =
    Array(h, java.lang.Double.doubleToLongBits(v))

  private def lessThanHead(h: Long, v: Double): Boolean = {
    val top = heap.peek()
    h < top(0) ||
      (h == top(0) && v < java.lang.Double.longBitsToDouble(top(1)))
  }

  def add(key: UTF8String, v: Double): Unit = {
    val h = KmvSketch.hash60(key)
    if (heap.size < k) heap.offer(pair(h, v))
    else if (lessThanHead(h, v)) { heap.poll(); heap.offer(pair(h, v)) }
  }

  def addRaw(h: Long, vBits: Long): Unit =
    if (heap.size < k) heap.offer(Array(h, vBits))
    else if (lessThanHead(h, java.lang.Double.longBitsToDouble(vBits))) {
      heap.poll(); heap.offer(Array(h, vBits))
    }

  def merge(o: BottomKSample): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) { val p = it.next(); addRaw(p(0), p(1)) }
  }

  /** Retained values ordered by (hash, value) ASC — the deterministic
    * sample order the SQL replay's `list(v ORDER BY h, v)` produces.
    */
  def sorted: Array[Array[Long]] = {
    val out = heap.toArray(new Array[Array[Long]](heap.size))
    java.util.Arrays.sort(out, new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c
        else java.lang.Double.compare(
          java.lang.Double.longBitsToDouble(a(1)), java.lang.Double.longBitsToDouble(b(1)))
      }
    })
    out
  }
}

/** SQL surface: `bottomk_sample(key, value, k) -> array<double>` — the
  * sampled values ordered by (hash, value) (registered by
  * [[graft.GraftExtensions]]; k must be a foldable INT).
  */
case class BottomKSampleAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSample]
  with TernaryLike[Expression] {

  // evaluate any foldable int constant — matching only a bare Literal
  // node would pass analysis then throw per-task
  private lazy val k: Int =
    (if (third.foldable) third.eval() else null) match {
      case v: Int if v >= 1 => v
      case _ => throw new IllegalArgumentException(
        s"bottomk_sample k must be a foldable positive INT, got ${third.sql}")
    }

  override def createAggregationBuffer(): BottomKSample = new BottomKSample(k)

  override def update(sk: BottomKSample, input: InternalRow): BottomKSample = {
    val key = first.eval(input)
    val v   = second.eval(input)
    if (key != null && v != null)
      sk.add(key.asInstanceOf[UTF8String], v.asInstanceOf[Double])
    sk
  }

  override def merge(a: BottomKSample, b: BottomKSample): BottomKSample = { a.merge(b); a }

  override def eval(sk: BottomKSample): Any = {
    val ps  = sk.sorted
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) { out(i) = java.lang.Double.longBitsToDouble(ps(i)(1)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(sk: BottomKSample): Array[Byte] = {
    val ps = sk.sorted
    val bb = ByteBuffer.allocate(4 + 16 * ps.length)
    bb.putInt(ps.length)
    var i = 0
    while (i < ps.length) { bb.putLong(ps(i)(0)); bb.putLong(ps(i)(1)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSample = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new BottomKSample(k)
    val n  = bb.getInt()
    var i = 0
    while (i < n) { sk.addRaw(bb.getLong(), bb.getLong()); i += 1 }
    sk
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == StringType && second.dataType == DoubleType &&
        third.dataType == IntegerType && third.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bottomk_sample requires (STRING key, DOUBLE value, INT literal k), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_sample"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomKSampleAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}
