package graft.functions

import org.apache.spark.sql.Column

/** Column wrapper for [[graft.plans.HexSliceLong]]: the engine-wide
  * replacement for `conv(substring(hexDigest, pos, len), 16, 10)` followed
  * by a numeric cast — one fused codegen'd parse instead of a substring
  * allocation, the general-base converter, a decimal-string render and a
  * re-parse (see the expression's scaladoc for the measured cost). The
  * DuckDB oracle mirrors are untouched: both engines still compute the
  * identical integer, this only changes HOW the Spark side parses it.
  */
object HexSlice {

  /** `conv(substring(hex, pos, len), 16, 10)` as a native long column;
    * `pos` 1-based, `len` ≤ 15 (value < 2^60, always non-negative).
    */
  def u(hex: Column, pos: Int, len: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.HexSliceLong(
        org.apache.spark.sql.GraftBridge.expression(hex), pos, len))
}
