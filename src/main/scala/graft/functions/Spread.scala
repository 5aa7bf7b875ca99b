package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism repair for CPU-heavy map segments
  * (optimization guide §2: derive partitioning from input size — never a
  * constant tuned for one deployment).
  *
  * A small parquet input opens as very few scan partitions (the bench
  * corpora are single-file, single-row-group parquets: EVERY scan opens as
  * ONE partition), so everything before the first exchange — the
  * tokenize+shingle explode, per-shingle md5 digests, codec decodes — runs
  * on one core regardless of the master's parallelism. At real scale the
  * same scan opens thousands of splits and needs no help.
  *
  * [[Spread.apply]] therefore repartitions by hash of `keys` to the session
  * default parallelism ONLY when the plan's estimated size (the same
  * planner estimate broadcast decisions read) could not fill half the cores
  * at the session's split size (`spark.sql.files.maxPartitionBytes`). Above
  * that threshold the scan is already wide and this is the IDENTITY — no
  * exchange is ever added at cluster scale, so nothing heavy is ever
  * re-shuffled (guide §8's "move big rows once" rule is preserved).
  *
  * Hash-by-key, never round-robin: the row→partition map is deterministic
  * under task retries (SPARK-38388) and skips the local
  * sort-before-repartition a keyless `repartition(n)` pays.
  */
object Spread {
  def apply(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "Spread needs at least one deterministic key column")
    val sess    = df.sparkSession
    val target  = sess.sparkContext.defaultParallelism
    val split   = sess.sessionState.conf.filesMaxPartitionBytes
    val narrow  =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes <
        BigInt(split) * math.max(1, target / 2)
      catch { case scala.util.control.NonFatal(_) => false }
    if (narrow) df.repartition(target, keys: _*) else df
  }
}
