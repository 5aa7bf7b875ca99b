package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a changelog into a base snapshot — the
  * batch MERGE INTO every table-format maintenance job (Delta/Iceberg/Hudi
  * compaction, warehouse upsert ingestion) runs at scale.
  *
  * Semantics: for each key, the highest-sequence event wins. `D` removes
  * the key, `U`/`I` replace (or create — an update to an absent key
  * inserts, matching MERGE's WHEN NOT MATCHED) the row with the event's
  * payload. Base rows participate as sequence-0 inserts, so a key never
  * touched by the changelog survives unchanged.
  *
  * Scale shape: ONE shuffle on the key — base and changelog are unioned
  * and reduced by a partially-aggregated `max_by` (map-side combine keeps
  * per-partition state at one row per distinct key), never a window (a
  * window would sort whole partitions for a per-key argmax) and never a
  * join (a join-based MERGE shuffles base AND changelog, then still needs
  * per-key latest-event resolution within the changelog side).
  */
object ChangeData {

  /** Apply `changes` (keyCol, seqCol, opCol in {I,U,D}, payload columns
    * matching `base`'s non-key columns) to `base`. Sequence numbers must be
    * ≥ 1 and unique per key (base rows take sequence 0) — ties would make
    * "latest" ill-defined in any engine.
    */
  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val tagged = base
      .select(col(keyCol) +: (payload.map(col) :+ lit(0L).as("__seq") :+ lit("I").as("__op")): _*)
      .unionByName(changes.select(
        col(keyCol) +: (payload.map(col) :+ col(seqCol).cast("long").as("__seq") :+ col(opCol).as("__op")): _*))
    tagged
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(payload.map(col) :+ col("__op"): _*),
        col("__seq")).as("r"))
      .where(col("r.__op") =!= "D")
      .select(col(keyCol) +: payload.map(c => col(s"r.$c").as(c)): _*)
  }
}
