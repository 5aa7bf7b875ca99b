package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected rows change
  * with partitioning, task retries, and cluster size — unacceptable when a
  * 100 TB corpus snapshot must be reproducible across reruns and resumes.
  * Here the keep/drop decision is a pure function of the row id (first 8
  * md5 hex chars of "salt:id" as a uint32, kept iff below
  * fraction·2³²), so every engine — including the DuckDB oracle — selects
  * the IDENTICAL rows. Map-side only: no shuffle, no RNG state, prunes at
  * the scan when the filter is the only predicate.
  *
  * The salt decouples independent samples: two samples with different
  * salts are uncorrelated; reusing a salt with a larger fraction yields a
  * SUPERSET of the smaller sample (nested samples — handy for scaling-law
  * data ladders).
  */
object Sampling {

  /** uint32 threshold for a keep-fraction in [0, 1]. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    (fraction * 4294967296.0).toLong
  }

  /** The deterministic uint32 hash of (salt, id). */
  def sampleHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8), 16, 10).cast("long")

  /** Uniform deterministic sample: keep ~`fraction` of rows. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double, salt: String = "sample"): DataFrame =
    df.where(sampleHash(col(idCol), salt) < lit(threshold(fraction)))

  /** Stratified deterministic sample: a different keep-fraction per value
    * of `stratumCol` (e.g. up-sample rare languages, down-sample dominant
    * ones). Strata absent from `fractions` fall back to `defaultFraction`.
    * Still a pure map-side filter — the per-stratum thresholds compile to
    * one CASE expression, no join, no shuffle.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "sample"): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(defaultFraction))) { case (acc, (k, f)) =>
      when(col(stratumCol) === lit(k), lit(threshold(f))).otherwise(acc)
    }
    df.where(sampleHash(col(idCol), salt) < thr)
  }
}
