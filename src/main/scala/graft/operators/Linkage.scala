package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Record linkage / entity resolution: find near-matching name strings.
  *
  * The classic pipeline (Fellegi–Sunter shape): reduce the corpus to its
  * DISTINCT name vocabulary, derive a cheap blocking key, score candidate
  * pairs only WITHIN a block with a normalized string similarity, keep
  * pairs above a threshold. Blocking is what makes linkage survive scale:
  * the quadratic is bounded per block, never corpus-wide.
  *
  * Scoring uses the native [[graft.plans.JaroWinkler]] expression —
  * codegen'd, byte-wise, DuckDB-parity — because Jaro-Winkler's
  * prefix-boosted normalized scale is the standard name matcher
  * (levenshtein's raw edit count can't rank "cold widget"/"old widget"
  * above "cold widget"/"hot widget"; both are distance ≤ 4).
  */
object Linkage {

  /** Jaro-Winkler similarity as a Column. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(graft.plans.JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Near-matching DISTINCT name pairs from `df`'s `nameCol`, blocked on
    * the `blockWord`-th whitespace word of the name (1-based), scored with
    * Jaro-Winkler, kept at `sim_r >= threshold` (threshold compares the
    * ROUNDED similarity so cross-engine verdicts can't flip on the 15th
    * decimal). Output: (name_a, name_b, sim_r) with name_a < name_b.
    *
    * Scale shape: the corpus reduces to the distinct-name vocabulary
    * FIRST (one partial-aggregated distinct — vocab-sized, like
    * spellSuggest's), so the self-join expands vocab-per-block squared,
    * never rows squared; the similarity is computed once per candidate
    * pair inside whole-stage codegen.
    */
  def nameMatches(
      df: DataFrame,
      nameCol: String,
      blockWord: Int = 2,
      threshold: Double = 0.85): DataFrame = {
    require(blockWord >= 1, s"blockWord ($blockWord) is 1-based")
    val names = df
      .select(col(nameCol).as("name"))
      .where(col("name").isNotNull)
      .distinct()
      .withColumn("blk", element_at(split(col("name"), " "), blockWord))
    names.as("a")
      .join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("sim_r",
        Portable.pround(jaroWinkler(col("a.name"), col("b.name")), 4))
      .where(col("sim_r") >= threshold)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"), col("sim_r"))
  }

  /** Edit-distance linkage: DISTINCT name pairs within `maxDist`
    * Levenshtein edits, same blocking contract as [[nameMatches]] — the
    * ABSOLUTE typo-budget complement to Jaro-Winkler's normalized scale
    * (a catalog SKU off by one character is dist 1 regardless of name
    * length; a JW threshold would pass short noise pairs long before it).
    * Distances are integers, so cross-engine parity is exact — no
    * rounding discipline needed anywhere.
    *
    * Scale shape: vocab-sized distinct first, block-bounded self-join,
    * and the DP runs through Spark's THRESHOLD form (`levenshtein(a, b,
    * k)` band-limits the DP to O(k·min(|a|,|b|)) and early-exits to -1
    * above k) — the oracle's plain `levenshtein(a,b) <= k` is the same
    * predicate computed the expensive way.
    *
    * Returns (name_a, name_b, dist) with name_a < name_b; dist >= 1
    * (identical strings were already collapsed by the distinct).
    */
  def editMatches(
      df: DataFrame,
      nameCol: String,
      blockWord: Int = 2,
      maxDist: Int = 2): DataFrame = {
    require(blockWord >= 1, s"blockWord ($blockWord) is 1-based")
    require(maxDist >= 1, s"maxDist ($maxDist) must be >= 1")
    val names = df
      .select(col(nameCol).as("name"))
      .where(col("name").isNotNull)
      .distinct()
      .withColumn("blk", element_at(split(col("name"), " "), blockWord))
    names.as("a")
      .join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name"), maxDist))
      .where(col("dist") =!= -1)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"), col("dist"))
  }
}
