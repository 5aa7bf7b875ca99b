package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * `depth × width` counter matrix; each input key increments one counter
  * per row (bucket = row-salted hash mod width); a key's frequency
  * estimate is the MIN of its `depth` counters — never an undercount,
  * over by at most ε·N (ε ≈ e/width) with probability 1−δ (δ ≈ e^−depth).
  *
  * This is the point-frequency member of the engine's mergeable-sketch
  * triad — KMV answers "how many distinct?" ([[KmvNdvAgg]]), SpaceSaving
  * answers "which keys are biggest?" ([[SpaceSavingAgg]]), CMS answers
  * "how often does THIS key occur?" for keys chosen AFTER the pass.
  * State is depth·width longs per task regardless of stream cardinality;
  * merge is element-wise addition — associative, commutative, and (unlike
  * SpaceSaving's eviction order) completely order-independent, so the
  * sketch is DETERMINISTIC under any partitioning and replayable
  * cross-engine.
  *
  * The row-d bucket of `key` is the engine's portable 60-bit md5 hash of
  * the salted string `"<d>:<key>"`, mod width — in SQL:
  * `('0x' || substr(md5(d::VARCHAR || ':' || key), 1, 15))::BIGINT % width`.
  * That replayability is the practical difference from Spark's built-in
  * `count_min_sketch` (whose murmur-based layout is opaque to SQL): the
  * DuckDB oracle rebuilds every counter this aggregate produces.
  *
  * Unlike the cardinality-sized exact `groupBy(key).count`, nothing here
  * scales with the key space: at 100 TB the exact heavy-key count needs a
  * full shuffle of all distinct keys; the CMS answer ships one
  * depth·width array up the exchange.
  *
  * SQL surface (registered by [[graft.GraftExtensions]]):
  * `cms_counts(key, depth, width) -> array<bigint>` — the counter matrix,
  * row-major (`counters[d*width + b]`), so callers probe with
  * `element_at(m, d*width + bucket + 1)`.
  */
final class CmsSketch(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)

  def add(key: UTF8String): Unit = {
    var d = 0
    while (d < depth) {
      counters(d * width + CmsSketch.bucket(d, key, width)) += 1L
      d += 1
    }
  }

  def merge(o: CmsSketch): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
  }
}

object CmsSketch {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Row-d bucket of `key`: first 15 hex digits of md5("<d>:<key>") as a
    * positive 60-bit BIGINT, mod width — byte-identical to the SQL replay.
    * The digest is fed the salt prefix then the key bytes (no intermediate
    * concatenated string); digest() resets it for the next row.
    */
  def bucket(d: Int, key: UTF8String, width: Int): Int = {
    val md = mdLocal.get()
    md.update(String.valueOf(d).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(':'.toByte)
    md.update(key.getBytes)
    val dig = md.digest()
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
    (h % width).toInt
  }
}

case class CountMinAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsSketch]
  with TernaryLike[Expression] {

  // checkInputDataTypes admits any FOLDABLE int (so `2+2` passes analysis)
  // — evaluate the constant rather than pattern-matching a bare Literal
  // node, which deferred the failure to a per-task execution throw
  private def intLit(e: Expression, what: String, lo: Int, hi: Int): Int =
    (if (e.foldable) e.eval() else null) match {
      case v: Int if v >= lo && v <= hi => v
      case _ => throw new IllegalArgumentException(
        s"cms_counts $what must be a foldable INT in [$lo,$hi], got ${e.sql}")
    }
  private lazy val depth: Int = intLit(second, "depth", 1, 16)
  private lazy val width: Int = intLit(third, "width", 2, 1 << 20)

  override def createAggregationBuffer(): CmsSketch = new CmsSketch(depth, width)

  override def update(sk: CmsSketch, input: InternalRow): CmsSketch = {
    val v = first.eval(input)
    if (v != null) sk.add(v.asInstanceOf[UTF8String])
    sk
  }

  override def merge(a: CmsSketch, b: CmsSketch): CmsSketch = { a.merge(b); a }

  override def eval(sk: CmsSketch): Any = {
    val out = new Array[Any](sk.counters.length)
    var i = 0
    while (i < out.length) { out(i) = sk.counters(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(sk: CmsSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * sk.counters.length)
    var i = 0
    while (i < sk.counters.length) { bb.putLong(sk.counters(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new CmsSketch(depth, width)
    var i = 0
    while (i < sk.counters.length) { sk.counters(i) = bb.getLong(); i += 1 }
    sk
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == StringType &&
        second.dataType == IntegerType && second.foldable &&
        third.dataType == IntegerType && third.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cms_counts requires (STRING key, INT literal depth, INT literal width), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "cms_counts"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CountMinAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}
