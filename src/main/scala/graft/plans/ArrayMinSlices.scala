package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass minima of fixed-width slices over a string array: for an array
  * of md5 hex digests, returns `[min(substr(h, 1, w)), min(substr(h, w+1,
  * w)), ...]` — `slices` minhash signature values from ONE traversal.
  *
  * Why it exists: the equivalent `array_min(transform(digests,
  * h -> substring(h, j*w+1, w)))` per slice runs `slices` interpreted
  * lambda passes with per-element allocation; this loop visits each digest
  * once and keeps all minima in registers. Comparison is UTF8String binary
  * order — identical to Spark's `array_min` string ordering and DuckDB's
  * default varchar `min`, so the DuckDB oracle mirrors with plain
  * `list_min(list_transform(...))`.
  *
  * Null semantics match `array_min`: null elements are ignored; an empty
  * (or all-null) array yields null minima.
  */
case class ArrayMinSlices(child: Expression, slices: Int, width: Int)
  extends UnaryExpression {

  require(slices > 0 && width > 0, s"slices ($slices) and width ($width) must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"array_min_slices requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArrayMinSlices.compute(input.asInstanceOf[ArrayData], slices, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ArrayMinSlices.compute($a, $slices, $width);")

  override def prettyName: String = "array_min_slices"

  override protected def withNewChildInternal(newChild: Expression): ArrayMinSlices =
    copy(child = newChild)
}

object ArrayMinSlices {
  /** Shared by interpreted eval and codegen (called from generated Java). */
  def compute(a: ArrayData, slices: Int, width: Int): GenericArrayData = {
    val mins = new Array[UTF8String](slices)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getUTF8String(i)
        var j = 0
        while (j < slices) {
          val s = h.substringSQL(j * width + 1, width)
          if (mins(j) == null || s.compareTo(mins(j)) < 0) mins(j) = s
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }
}
