package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary-lexicographic string MIN as a TypedImperativeAggregate.
  *
  * Semantically identical to `min(stringCol)` — UTF8String.compareTo IS
  * the unsigned-byte order Spark's Min uses — but it PLANS differently:
  * a declarative Min over StringType has a variable-length aggregation
  * buffer, which HashAggregateExec's mutable UnsafeRow cannot hold, so
  * Spark silently degrades the whole Aggregate to SortAggregate — a full
  * sort of the input on the grouping key on BOTH sides of the exchange
  * (the r16 weighted-minhash plan audit caught exactly that shape under
  * 16 min(string) columns). A TypedImperativeAggregate routes through
  * ObjectHashAggregateExec instead: hash-based, partial-merge map-side,
  * no sort. State is ONE retained string per (group, column).
  *
  * Null discipline matches Min: nulls are skipped; an all-null / empty
  * group evaluates to null.
  */
final class MinStrState {
  var value: UTF8String = null
}

case class MinStringAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinStrState]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): MinStrState = new MinStrState

  override def update(st: MinStrState, input: InternalRow): MinStrState = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // clone: the input row's backing buffer is reused by the scan
      if (st.value == null || s.compareTo(st.value) < 0) st.value = s.clone()
    }
    st
  }

  override def merge(a: MinStrState, b: MinStrState): MinStrState = {
    if (b.value != null && (a.value == null || b.value.compareTo(a.value) < 0))
      a.value = b.value
    a
  }

  override def eval(st: MinStrState): Any = st.value

  // 1-byte presence prefix: without it, an empty byte array would be the
  // "no value seen" marker AND the serialization of a genuine ""-minimum,
  // so a group whose min is '' would decode to null after a shuffle
  override def serialize(st: MinStrState): Array[Byte] =
    if (st.value == null) Array.emptyByteArray
    else {
      val b = st.value.getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): MinStrState = {
    val st = new MinStrState
    if (bytes.nonEmpty)
      st.value = UTF8String.fromBytes(bytes, 1, bytes.length - 1)
    st
  }

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_str requires a STRING child, got ${child.dataType.catalogString}")
  override def nullable: Boolean = true
  override def prettyName: String = "min_str"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinStringAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinStringAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinStringAgg =
    copy(child = newChild)
}
