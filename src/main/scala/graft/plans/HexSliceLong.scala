package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `conv(substring(hex, pos, len), 16, 10)` as ONE fused long-valued
  * expression (r20 optimization round, guide §"eliminate expensive
  * expressions in the hot path").
  *
  * Why it exists: every deterministic draw in the engine slices an md5/sha
  * hex digest and feeds it through `conv(_, 16, 10)`. `Conv` is the
  * general any-base converter: it allocates a UTF8String for the substring,
  * parses it with the full signed/overflow machinery into an unsigned
  * value, RENDERS the result back to a decimal string, and the caller's
  * `.cast("long"/"double")` then re-parses that string. Profiled at sf0.1
  * (quad-digest randomization stream, 9.6M slices): the conv+cast chain
  * alone measured ~4 s of an ~9 s query. This expression reads the `len`
  * hex nibbles in place — no substring materialization, no decimal-string
  * round trip — and returns the long directly.
  *
  * Contract (narrower than conv, matching every call site): `pos` is
  * 1-based, `len` ≤ 15 so the value fits a non-negative long
  * (15 nibbles < 2^60); input bytes at the slice must be lowercase hex
  * `[0-9a-f]` — what md5/sha1/sha2 hex output is. Like conv, parsing stops
  * at the first non-hex byte (yielding the prefix value, 0 for an empty
  * prefix) and a slice past the end of the string reads as the available
  * prefix; NULL input yields NULL. Equality with
  * `conv(substring(s, pos, len), 16, 10).cast("long")` is fuzz-pinned in
  * HexSliceLongSpec, and `.cast("double")` equality follows because both
  * paths round the same integer to the same nearest double.
  */
case class HexSliceLong(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {
  require(pos >= 1, s"pos ($pos) is 1-based and must be >= 1")
  require(len >= 1 && len <= 15, s"len ($len) must be in [1, 15] to fit a long")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    HexSliceLong.parse(input.asInstanceOf[UTF8String], pos, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HexSliceLong.parse($c, $pos, $len)")

  override protected def withNewChildInternal(newChild: Expression): HexSliceLong =
    copy(child = newChild)

  override def prettyName: String = "graft_hex_slice_long"
}

object HexSliceLong {

  /** Parse `len` lowercase-hex nibbles of `s` starting at 1-based `pos`
    * into a long; stops at the string end or the first non-hex byte
    * (conv's valid-prefix rule on this input class).
    */
  def parse(s: UTF8String, pos: Int, len: Int): Long = {
    val bytes = s.getBytes
    var i     = pos - 1
    val end   = math.min(bytes.length, pos - 1 + len)
    var v     = 0L
    while (i < end) {
      val b = bytes(i)
      val nib =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else -1
      if (nib < 0) return v
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
