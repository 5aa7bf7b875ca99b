package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass a–z character histogram: byte-wise lowercase, count
  * each of the 26 letters, return `ARRAY<INT>` of length 26 (index 0 =
  * 'a').
  *
  * Why it exists (round-8 audit): `withCharEntropy` needed 26 per-letter
  * counts and the only built-in shape — 26 bound
  * `length(x) - length(translate(x, c, ''))` columns — traverses every
  * document 26 times (4.5 s at sf0.1, the 4th-slowest query, for a pure
  * map-side expression). This is exactly the cost [[CleanToken]] was
  * built to kill for cleaning: one fused byte loop, zero regex, zero
  * boxing, emitted as a direct static call so it stays inside
  * whole-stage codegen.
  *
  * Lowercasing is BYTE-wise (A–Z + 32), matching [[CleanToken]] and the
  * reference's tolower loop — NOT Unicode `lower()`: multibyte UTF-8
  * bytes are negative and fall through both range checks, so exotic
  * case-foldings that materialize new ASCII letters (İ → i̇) count here
  * as zero. Identical to `lower` + `translate` counting for all ASCII
  * input (the testdata and reference corpora are pure ASCII; the DuckDB
  * oracle keeps the `lower`/`replace` mirror).
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CharClassCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharClassCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_char_class_counts"
}

object CharClassCounts {

  /** Single-pass byte loop: A-Z → a-z, bump that letter's bucket, ignore
    * everything else. Returns an UnsafeArrayData (no per-element boxing).
    */
  def counts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out   = new Array[Int](26)
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if (b >= 'a' && b <= 'z') out(b - 'a') += 1
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
