package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable numeric helpers.
  *
  * `round()` differs between engines at exact half-way points (Spark rounds
  * the shortest decimal representation via BigDecimal HALF_UP; DuckDB rounds
  * the scaled double with std::round) — e.g. a score of exactly 0.96525
  * rounds to 0.9652 in Spark and 0.9653 in DuckDB. `floor(x * 10^n + 0.5) /
  * 10^n` — the same primitive double ops on both sides — rounds identically
  * whenever the inputs are bit-identical. SQL mirror:
  * `floor(x * 1eN + 0.5) / 1eN`.
  *
  * Caveat on inputs: per-row expressions and fixed left-folds ARE
  * bit-identical across engines, but SHUFFLED double sums combine partials
  * in engine-chosen order and can differ by ulps; such a rounded sum only
  * diverges if it lands within an ulp of an exact .5 boundary —
  * measure-zero in practice, but only fixed-point/decimal arithmetic could
  * eliminate it entirely.
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
