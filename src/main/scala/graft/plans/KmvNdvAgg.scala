package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch: keep the `k` smallest distinct
  * hash values of the stream; the k-th smallest, as a fraction R of the
  * hash space, estimates NDV ≈ (k−1)/R (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002). State is k entries
  * per task regardless of stream cardinality; merge = union, keep the k
  * smallest — ASSOCIATIVE, COMMUTATIVE and DETERMINISTIC, because bottom-k
  * of a fixed hash doesn't depend on arrival or merge order. That
  * determinism is the practical difference from both HLL
  * (`approx_count_distinct`: not cross-engine replayable) and SpaceSaving
  * (eviction order matters): the DuckDB oracle replays the ENTIRE sketch —
  * sample and estimate — exactly, in SQL, even in estimation mode.
  *
  * The hash is the first 15 hex digits of md5 (60 bits, uniform, positive
  * BIGINT) — the same portable construction the engine's deterministic
  * samplers use, replayable as `('0x' || substr(md5(key), 1, 15))::BIGINT`.
  *
  * The retained keys double as a uniform DISTINCT-value sample (min-wise
  * sampling), which is what makes the sketch useful beyond counting:
  * a rerun-stable "show me ~k representative distinct values" over a
  * stream whose key space doesn't fit anywhere.
  */
final class KmvSketch(val k: Int) {
  // hash -> key; TreeMap keeps the k smallest in order
  val m = new java.util.TreeMap[java.lang.Long, UTF8String]()

  def add(key: UTF8String): Unit = {
    val h = KmvSketch.hash60(key)
    if (m.containsKey(h)) return
    if (m.size < k) { m.put(h, key.clone()); return }
    if (h < m.lastKey()) { m.remove(m.lastKey()); m.put(h, key.clone()) }
  }

  def merge(o: KmvSketch): Unit = {
    val it = o.m.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      if (!m.containsKey(en.getKey)) {
        if (m.size < k) m.put(en.getKey, en.getValue)
        else if (en.getKey < m.lastKey()) { m.remove(m.lastKey()); m.put(en.getKey, en.getValue) }
      }
    }
  }

  /** (k−1)/R with R = kth-smallest hash / 2^60; exact size when the sketch
    * never filled (it has then SEEN every distinct value).
    */
  def estimate: Double =
    if (m.size < k) m.size.toDouble
    else (k - 1).toDouble / (m.lastKey().toDouble / KmvSketch.HashSpace)
}

object KmvSketch {
  val HashSpace: Double = math.pow(2.0, 60)

  /** One digest per thread, reused via digest()'s implicit reset:
    * getInstance allocates (provider lookup + internal state) and hash60
    * runs once per input ROW in the aggregate's update hot path. */
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 15 hex digits of md5(key) as a positive BIGINT — portable. */
  def hash60(key: UTF8String): Long = {
    val d = mdLocal.get().digest(key.getBytes)
    // 15 hex digits = 60 bits = first 7 bytes + high nibble of the 8th
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  val ResultType: DataType = StructType(Seq(
    StructField("ndv_est", DoubleType, nullable = false),
    StructField("sample", ArrayType(StringType, containsNull = false), nullable = false)))
}

/** SQL surface: `kmv_ndv(key, k) -> struct<ndv_est double, sample array<string>>`
  * (registered by [[graft.GraftExtensions]]; k must be an INT literal).
  * The sample is the retained keys ordered by hash — deterministic.
  */
case class KmvNdvAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch]
  with BinaryLike[Expression] {

  // evaluate any foldable int constant (`16`, `8*2`) — matching only a
  // bare Literal node would pass analysis then throw per-task
  private lazy val k: Int =
    (if (right.foldable) right.eval() else null) match {
      case v: Int if v >= 2 => v
      case _ => throw new IllegalArgumentException(
        s"kmv_ndv k must be a foldable INT >= 2, got ${right.sql}")
    }

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(sk: KmvSketch, input: InternalRow): KmvSketch = {
    val v = left.eval(input)
    if (v != null) sk.add(v.asInstanceOf[UTF8String])
    sk
  }

  override def merge(a: KmvSketch, b: KmvSketch): KmvSketch = { a.merge(b); a }

  override def eval(sk: KmvSketch): Any = {
    val sample = new Array[Any](sk.m.size)
    var i = 0
    val it = sk.m.values().iterator()
    while (it.hasNext) { sample(i) = it.next(); i += 1 }
    // same floor-based 4-dp rounding as Portable.pround, scalar form
    InternalRow(
      math.floor(sk.estimate * 1e4 + 0.5) / 1e4,
      new GenericArrayData(sample))
  }

  override def serialize(sk: KmvSketch): Array[Byte] = {
    var sz = 4
    val it0 = sk.m.values().iterator()
    while (it0.hasNext) sz += 8 + 4 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(sk.m.size)
    val it = sk.m.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      bb.putLong(en.getKey)
      val kb = en.getValue.getBytes
      bb.putInt(kb.length); bb.put(kb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new KmvSketch(k)
    val n  = bb.getInt()
    var i = 0
    while (i < n) {
      val h   = bb.getLong()
      val len = bb.getInt()
      val kb  = new Array[Byte](len)
      bb.get(kb)
      sk.m.put(h, UTF8String.fromBytes(kb))
      i += 1
    }
    sk
  }

  override def dataType: DataType = KmvSketch.ResultType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "kmv_ndv requires (STRING key, INT literal k), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_ndv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvNdvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvNdvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvNdvAgg =
    copy(left = newLeft, right = newRight)
}
