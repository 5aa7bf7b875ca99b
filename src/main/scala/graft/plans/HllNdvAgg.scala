package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct sketch (Flajolet–Fusy–Gandouet–Meunier, AofA
  * 2007) over the engine's PORTABLE 60-bit md5 hash: 2^p byte registers,
  * register j = max leading-zero rank of the hashes routed to j; merge =
  * element-wise max — associative, commutative, order-free. Estimate is
  * the bias-corrected harmonic mean α_m·m²/Σ2^(−M_j) with the standard
  * small-range fallback to linear counting (m·ln(m/V) while E ≤ 2.5m and
  * empty registers remain); no large-range correction is needed at 60
  * hash bits.
  *
  * What this adds over the sketch family's [[KmvNdvAgg]]: constant
  * 2^p BYTES of state (KMV holds k full keys — at k=256 and long URLs
  * that's tens of KB per group) and a cheaper update (route + max, no
  * TreeMap), the shape register-based production systems standardize on.
  * KMV keeps its own niche: the retained keys double as a distinct-value
  * SAMPLE, which registers can't give.
  *
  * Unlike `approx_count_distinct` (whose internal hash no other engine
  * reproduces), every piece here is md5-deterministic, so the ORACLE
  * REPLAYS THE WHOLE SKETCH IN SQL: idx = top p bits of the 60-bit hash,
  * rank = leading zeros of the remaining w = 60−p bits + 1 (computed
  * exactly via binary-string length, never floating log2), registers =
  * `max(rank) GROUP BY idx`, and the harmonic sum Σ2^(−M_j) is kept
  * EXACT by summing the integers 2^(w+1−M_j) (total ≤ 2^61, a plain
  * 64-bit long on both engines) and dividing once at the end — cross-engine identical
  * to the last bit, because a floating Σ of 2^(−M) terms spanning 57
  * binades rounds differently under different summation orders.
  */
final class HllSketch(val p: Int) {
  val m: Int = 1 << p
  val w: Int = 60 - p
  val regs = new Array[Byte](m)

  def add(key: UTF8String): Unit = {
    val h = KmvSketch.hash60(key)
    val idx = (h >>> w).toInt
    val rest = h & ((1L << w) - 1)
    // rank = leading zeros within the w-bit window + 1; all-zero rest
    // saturates at w + 1
    val rank =
      if (rest == 0L) w + 1
      else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def merge(o: HllSketch): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  private def alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** (estimate rounded 4 dp, empty-register count). */
  def estimate: (Double, Int) = {
    // exact integer harmonic sum: Σ 2^(w+1−M_j) == 2^(w+1)·Σ 2^(−M_j);
    // bounded by m·2^(w+1) = 2^p·2^(61−p) = 2^61, so a plain long holds
    // it exactly at every admissible p
    var sum = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      val mj = regs(i).toInt
      if (mj == 0) zeros += 1
      sum += 1L << (w + 1 - mj)
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble *
      math.pow(2.0, (w + 1).toDouble) / sum.toDouble
    val e =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    (math.floor(e * 1e4 + 0.5) / 1e4, zeros)
  }
}

object HllSketch {
  val ResultType: DataType = StructType(Seq(
    StructField("ndv_est", DoubleType, nullable = false),
    StructField("n_zero_regs", IntegerType, nullable = false)))
}

/** SQL surface: `hll_ndv(key, p) -> struct<ndv_est double, n_zero_regs int>`
  * (registered by [[graft.GraftExtensions]]; p must be a foldable INT in
  * [4, 16]).
  */
case class HllNdvAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch]
  with BinaryLike[Expression] {

  // range validity is established at ANALYSIS time (checkInputDataTypes
  // below), so by the time a buffer is created on an executor this is a
  // plain read, never a mid-job failure
  private lazy val p: Int = right.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(sk: HllSketch, input: InternalRow): HllSketch = {
    val v = left.eval(input)
    if (v != null) sk.add(v.asInstanceOf[UTF8String])
    sk
  }

  override def merge(a: HllSketch, b: HllSketch): HllSketch = { a.merge(b); a }

  override def eval(sk: HllSketch): Any = {
    val (e, zeros) = sk.estimate
    InternalRow(e, zeros)
  }

  override def serialize(sk: HllSketch): Array[Byte] = sk.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllSketch = {
    val sk = new HllSketch(p)
    System.arraycopy(bytes, 0, sk.regs, 0, sk.m)
    sk
  }

  override def dataType: DataType = HllSketch.ResultType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable) {
      // fold the range/null check in here too, so hll_ndv(k, 99) or a null
      // literal fails at planning time, not mid-job on an executor
      right.eval() match {
        case v: Int if v >= 4 && v <= 16 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"hll_ndv p must be a non-null INT literal in [4, 16], got $other")
      }
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hll_ndv requires (STRING key, INT literal p), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def nullable: Boolean = false
  override def prettyName: String = "hll_ndv"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllNdvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllNdvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllNdvAgg =
    copy(left = newLeft, right = newRight)
}
