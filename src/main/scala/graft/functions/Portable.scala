package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable numeric helpers.
  *
  * `round()` differs between engines at exact half-way points (Spark rounds
  * the shortest decimal representation via BigDecimal HALF_UP; DuckDB rounds
  * the scaled double with std::round) — e.g. a score of exactly 0.96525
  * rounds to 0.9652 in Spark and 0.9653 in DuckDB. Since the underlying
  * doubles ARE bit-identical across engines (fixed fold order everywhere in
  * this codebase), `floor(x * 10^n + 0.5) / 10^n` — the same primitive double
  * ops on both sides — gives bit-identical "rounded" values at any scale
  * factor. SQL mirror: `floor(x * 1eN + 0.5) / 1eN`.
  */
object Portable {

  /** Portable half-up rounding to n decimal places (both engines compute the
    * identical double expression). Convention: halves round toward +inf.
    */
  def pround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * f + lit(0.5)) / f
  }

  /** The DuckDB-side mirror of [[pround]] for oracle SQL. */
  def proundSql(expr: String, n: Int): String =
    s"floor(($expr) * 1e$n + 0.5) / 1e$n"
}
