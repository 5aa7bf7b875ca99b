package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SpaceSaving (frequent-items) sketch: at most `capacity` stored
  * (key, count, err) entries regardless of stream cardinality.
  *
  * Single-stream update (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams", ICDT 2005): a hit
  * increments its entry; a miss with room inserts (1, 0); a miss at
  * capacity evicts the minimum-count entry and inherits its count —
  * (min+1, err=min) — so every stored count OVERESTIMATES the true
  * frequency by at most its recorded `err`, and min ≤ N/capacity.
  *
  * Distributed merge (the mergeable-summaries form, Agarwal et al., PODS
  * 2012): counts and errors add for shared keys; a key absent from one
  * side is credited that side's minimum count (it could have been evicted
  * there after accumulating up to that much) — keeping the overestimate
  * invariant — then the union is trimmed back to `capacity` by keeping the
  * largest counts. Per-key error after any merge tree stays bounded by
  * Σᵢ Nᵢ/capacity = N/capacity.
  *
  * This is the 1000-executor shape for "top keys of a 100 TB stream": each
  * task keeps one capacity-bounded sketch, partial sketches merge up the
  * exchange like any partial aggregate, and nothing key-cardinality-sized
  * ever shuffles (contrast: exact heavy hitters shuffle every distinct
  * key once — `q_key_skew` — fine at metadata scale, not at raw-stream
  * scale).
  */
final class SpaceSavingSketch(val capacity: Int) {
  // key -> [count, err]; values boxed once in a 2-slot primitive array
  val entries = new java.util.HashMap[UTF8String, Array[Long]]()
  var totalN: Long = 0L

  // Amortized-O(1) eviction (the naive per-miss min SCAN measured 3×
  // SLOWER than an exact groupBy at 75k distinct keys / capacity 64 —
  // 64 compares × one per miss): cache the current minimum count and the
  // keys sitting at it. A miss pops a pooled key (skipping entries whose
  // count grew since pooling — counts only increase, so a stale entry is
  // detectable by a single compare); the pool refills with one O(capacity)
  // scan only when it drains, which under eviction pressure is roughly
  // once per `capacity` misses. Transient: rebuilt lazily after
  // merge/trim/deserialize.
  private var minC: Long = 0L
  private val minPool = new java.util.ArrayDeque[UTF8String]()

  private def rebuildPool(): Unit = {
    var m = Long.MaxValue
    val it = entries.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
    minC = m
    val it2 = entries.entrySet().iterator()
    while (it2.hasNext) {
      val en = it2.next()
      if (en.getValue()(0) == minC) minPool.add(en.getKey)
    }
  }

  private def minCount: Long = {
    if (entries.size < capacity) return 0L
    var m = Long.MaxValue
    val it = entries.values().iterator()
    while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
    m
  }

  def add(k: UTF8String): Unit = {
    totalN += 1
    val e = entries.get(k)
    if (e != null) { e(0) += 1; return }
    if (entries.size < capacity) { entries.put(k.clone(), Array(1L, 0L)); return }
    // evict a min-count entry; the newcomer inherits its count as error
    while (true) {
      if (minPool.isEmpty) rebuildPool()
      val mk = minPool.poll()
      val me = entries.get(mk)
      if (me != null && me(0) == minC) {
        entries.remove(mk)
        entries.put(k.clone(), Array(minC + 1, minC))
        return
      }
    }
  }

  /** Add a pre-aggregated entry (merge path). */
  def addEntry(k: UTF8String, c: Long, err: Long): Unit = {
    val e = entries.get(k)
    if (e != null) { e(0) += c; e(1) += err }
    else entries.put(k, Array(c, err))
  }

  def merge(o: SpaceSavingSketch): Unit = {
    if (o.entries.isEmpty) { totalN += o.totalN; return }
    val min1 = minCount
    val min2 = o.minCount
    // credit keys missing from the OTHER side with that side's min
    if (min2 > 0) {
      val it = entries.values().iterator()
      while (it.hasNext) { val e = it.next(); e(0) += min2; e(1) += min2 }
    }
    val it2 = o.entries.entrySet().iterator()
    while (it2.hasNext) {
      val en  = it2.next()
      val ex  = entries.get(en.getKey)
      if (ex != null) {
        // both sides stored it — undo this key's share of the blanket
        // min2 credit (its real count from side 2 is known)
        ex(0) += en.getValue()(0) - min2
        ex(1) += en.getValue()(1) - min2
      } else {
        entries.put(en.getKey.clone(), Array(en.getValue()(0) + min1, en.getValue()(1) + min1))
      }
    }
    totalN += o.totalN
    trim()
    minPool.clear() // counts changed — min cache is stale
  }

  /** Keep the `capacity` largest counts (ties: key ASC for determinism). */
  private def trim(): Unit = {
    if (entries.size <= capacity) return
    val arr = new Array[(UTF8String, Array[Long])](entries.size)
    var i = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) { val en = it.next(); arr(i) = (en.getKey, en.getValue); i += 1 }
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Array[Long])] {
      override def compare(a: (UTF8String, Array[Long]), b: (UTF8String, Array[Long])): Int = {
        val c = java.lang.Long.compare(b._2(0), a._2(0))
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    entries.clear()
    i = 0
    while (i < capacity) { entries.put(arr(i)._1, arr(i)._2); i += 1 }
  }

  /** (key, est, err) rows sorted est DESC, key ASC — deterministic when no
    * eviction ever happened (capacity ≥ distinct keys ⇒ sketch is EXACT).
    */
  def result(): Array[InternalRow] = {
    val arr = new Array[(UTF8String, Array[Long])](entries.size)
    var i = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) { val en = it.next(); arr(i) = (en.getKey, en.getValue); i += 1 }
    java.util.Arrays.sort(arr, new java.util.Comparator[(UTF8String, Array[Long])] {
      override def compare(a: (UTF8String, Array[Long]), b: (UTF8String, Array[Long])): Int = {
        val c = java.lang.Long.compare(b._2(0), a._2(0))
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    arr.map { case (k, ce) => InternalRow(k, ce(0), ce(1)): InternalRow }
  }

  def serializedSize: Int = {
    var sz = 4 + 8 // size + totalN
    val it = entries.keySet().iterator()
    while (it.hasNext) sz += 4 + it.next().numBytes() + 16
    sz
  }

  def writeTo(bb: ByteBuffer): Unit = {
    bb.putInt(entries.size)
    bb.putLong(totalN)
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      val kb = en.getKey.getBytes
      bb.putInt(kb.length); bb.put(kb)
      bb.putLong(en.getValue()(0)); bb.putLong(en.getValue()(1))
    }
  }
}

object SpaceSavingSketch {
  def readFrom(bb: ByteBuffer, capacity: Int): SpaceSavingSketch = {
    val sk = new SpaceSavingSketch(capacity)
    val n = bb.getInt()
    sk.totalN = bb.getLong()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb  = new Array[Byte](len)
      bb.get(kb)
      sk.addEntry(UTF8String.fromBytes(kb), bb.getLong(), bb.getLong())
      i += 1
    }
    sk
  }

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
}

/** SQL surface: `spacesaving_topk(key, capacity) -> array<struct<key,est,err>>`
  * (registered by [[graft.GraftExtensions]]; capacity must be a literal).
  */
case class SpaceSavingAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch]
  with BinaryLike[Expression] {

  // evaluate any foldable int constant (`32`, `16*2`) — matching only a
  // bare Literal node would pass analysis then throw per-task
  private lazy val capacity: Int =
    (if (right.foldable) right.eval() else null) match {
      case v: Int if v >= 1 => v
      case _ => throw new IllegalArgumentException(
        s"spacesaving_topk capacity must be a foldable positive INT, got ${right.sql}")
    }

  override def createAggregationBuffer(): SpaceSavingSketch = new SpaceSavingSketch(capacity)

  override def update(sk: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = left.eval(input)
    if (v != null) sk.add(v.asInstanceOf[UTF8String])
    sk
  }

  override def merge(a: SpaceSavingSketch, b: SpaceSavingSketch): SpaceSavingSketch = {
    a.merge(b)
    a
  }

  override def eval(sk: SpaceSavingSketch): Any =
    new GenericArrayData(sk.result().asInstanceOf[Array[Any]])

  override def serialize(sk: SpaceSavingSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(sk.serializedSize)
    sk.writeTo(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch =
    SpaceSavingSketch.readFrom(ByteBuffer.wrap(bytes), capacity)

  override def dataType: DataType = SpaceSavingSketch.ResultType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "spacesaving_topk requires (STRING key, INT literal capacity), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "spacesaving_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpaceSavingAgg =
    copy(left = newLeft, right = newRight)
}
