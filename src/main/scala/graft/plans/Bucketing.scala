package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated joins
  * and aggregations on the bucket key run with NO exchange at read time.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once at ingest: two tables bucketed into the
  * same number of buckets on their join key sort-merge-join partition-to-
  * partition (bucket pruning + no Exchange in the plan — asserted in
  * PlansSpec).
  */
object Bucketing {

  /** Write `df` as a parquet-backed bucketed catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching bucket
    * counts Spark plans a shuffle-free sort-merge join.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True when the executed plan contains no shuffle exchange (the whole
    * point of bucketing).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
