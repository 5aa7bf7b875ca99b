package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two numeric array columns (float or
  * double elements), accumulated in double with a fixed LEFT-FOLD order —
  * bit-identical to `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)),
  * 0d, (acc,v) -> acc+v)` and to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  *
  * Why it exists: Spark's higher-order functions (`zip_with`, `aggregate`)
  * evaluate their lambdas INTERPRETED, allocating per element — the dot
  * product dominates every similarity plan (brute-force top-k, IVF, LSH
  * projections, near-dup verify), so it is the one expression worth a
  * hand-written `doGenCode` tight loop over primitive arrays.
  *
  * Null semantics mirror the zip_with form: null input, length mismatch
  * (zip_with would null-pad and poison the fold), or any null element ⇒
  * null result — `Similarity.withLshBucket`'s wrong-dim guard relies on it.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
        if Seq(l, r).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType) = t match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }
    val (lg, rg) = (getter(elemType(left)), getter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    acc += (double) $a.$lg($i) * (double) $b.$rg($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = acc; }
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "array_dot"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
