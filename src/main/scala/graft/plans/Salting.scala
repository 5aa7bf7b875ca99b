package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skew: when one key dominates (a stop word, a null-ish
  * default, a celebrity user), a single reducer receives most of the data.
  * Salting splits each hot key into `salts` sub-keys so the heavy partition
  * fans out, at the cost of a second (tiny) reduce or a small-side blowup.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the aggregation case and the broadcast-impossible join
  * case deterministically in the plan.
  */
object Salting {

  /** Deterministic salt in [0, salts): hash of a row-unique column. (A
    * random salt would break retry/speculation determinism — Spark may
    * re-execute tasks.)
    */
  def saltOf(uniqueCol: Column, salts: Int): Column = pmod(hash(uniqueCol), lit(salts))

  /** Skew-resistant count per key: partial count per (key, salt), then the
    * (salts-wide, tiny) final roll-up per key. Result == plain
    * groupBy(key).count() for any data; the win is that no single task ever
    * aggregates a whole hot key.
    */
  def saltedCount(df: DataFrame, keyCol: String, uniqueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltOf(col(uniqueCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salting ADVISOR — the metadata-sized planner feeding the two
    * executors above: per key whose row count exceeds `targetRows`, the
    * salt factor that brings its heaviest sub-partition back under
    * target (n_salts = ⌈cnt/target⌉) and the resulting per-task rows.
    * Run it on the key histogram BEFORE the big aggregation/join (the
    * [[graft.operators.Stats.joinCardinality]] companion): keys absent
    * from the plan don't need salting, and the plan's output is
    * hot-key-count-sized, never data-sized.
    */
  def saltPlan(df: DataFrame, keyCol: String, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows ($targetRows) must be positive")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > targetRows)
      .withColumn("n_salts", ceil(col("cnt").cast("double") / targetRows).cast("long"))
      .withColumn("rows_per_task",
        ceil(col("cnt").cast("double") / col("n_salts")).cast("long"))
  }

  /** Skew-resistant equi-join: salt the big side deterministically and
    * replicate the small side once per salt, so a hot join key spreads over
    * `salts` tasks. Result == big.join(small, key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, uniqueCol: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(col(uniqueCol), salts))
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
