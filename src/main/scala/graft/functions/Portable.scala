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

  // Abramowitz & Stegun 26.2.17 rational approximation of the standard
  // normal tail (|ε| < 7.5e-8 — far inside the engine's 6-dp rounding).
  // The constants are emitted VERBATIM into both engines (the literal-
  // drift rule), and the polynomial is evaluated in the SAME Horner
  // order, so both sides run the identical sequence of double ops.
  private val P0 = 0.2316419
  private val B1 = 0.319381530
  private val B2 = -0.356563782
  private val B3 = 1.781477937
  private val B4 = -1.821255978
  private val B5 = 1.330274429
  private val Sqrt2Pi = math.sqrt(2.0 * math.Pi)

  /** Two-sided normal p-value 2(1 − Φ(|z|)) as a portable Column: feed it
    * a ROUNDED z (derive-from-rounded-pieces) and both engines see
    * bit-identical inputs through an identical op sequence; `exp` parity
    * at 6-dp output rounding has held empirically across the engine's ln/
    * exp surface. NULL propagates.
    */
  def normTwoSidedP(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(P0) * az)
    val poly = t * (lit(B1) + t * (lit(B2) + t * (lit(B3) + t * (lit(B4) + t * lit(B5)))))
    val pdf = exp(-((az * az) / lit(2.0))) / lit(Sqrt2Pi)
    lit(2.0) * (pdf * poly)
  }

  /** The DuckDB-side mirror of [[normTwoSidedP]]: `zExpr` is evaluated
    * once per reference — pass a column name, not a computation.
    */
  def normTwoSidedPSql(zExpr: String): String = {
    val az = s"abs($zExpr)"
    val t = s"(1.0 / (1.0 + $P0 * $az))"
    val poly = s"($t * ($B1 + $t * ($B2 + $t * ($B3 + $t * ($B4 + $t * $B5)))))"
    s"(2.0 * ((exp(-(($az * $az) / 2.0)) / $Sqrt2Pi) * $poly))"
  }
}
