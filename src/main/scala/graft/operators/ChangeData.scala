package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Slowly-changing-dimension TYPE 2 history build — the warehouse's
    * audit-trail counterpart to [[applyChangelog]]'s snapshot MERGE: every
    * version a key ever had survives as its own row, framed by
    * `(valid_from, valid_to)` sequence numbers, with `is_current` marking
    * the live version.
    *
    * Semantics: base rows open version 0; each `I`/`U` event opens a new
    * version at its sequence; the NEXT event on the key (any op, including
    * `D`) closes the previous version at its sequence. A `D` closes the
    * chain without opening a version, so a deleted key has no current row
    * — exactly [[applyChangelog]]'s verdict, and the spec pins the
    * `is_current` slice equal to it.
    *
    * Scale shape: one shuffle on the key; the window partitions are
    * per-key VERSION CHAINS — sized by changelog depth per key (a handful
    * of events), never by the table — so the sort inside each partition is
    * trivially bounded. No join: base and changelog union and sort once.
    */
  def scdType2(
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
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__seq"))
    tagged
      .withColumn("__next", lead(col("__seq"), 1).over(w))
      .where(col("__op") =!= "D")
      .select(col(keyCol) +: payload.map(col)
        :+ col("__seq").as("valid_from")
        :+ col("__next").as("valid_to")
        :+ col("__next").isNull.as("is_current"): _*)
  }

  /** TEMPORAL (point-in-time) join against an [[scdType2]] history — the
    * reason the history exists: enrich each fact with the dimension
    * version that was CURRENT at the fact's own sequence time, never the
    * latest one (the classic as-of-load correctness bug: joining facts to
    * today's dimension rewrites history). A fact at sequence s matches
    * the version with `valid_from <= s < valid_to` (open-ended current
    * version matches everything from its valid_from on); facts before
    * the key's first version, or inside a deletion gap, get NULL
    * dimension columns (left join) — auditable, not silently dropped.
    *
    * Scale shape: a plain equi-join ON THE KEY with the interval
    * predicate as a join-level filter — no range bucketization needed
    * because version chains are changelog-depth-sized (a handful of
    * rows per key), so the per-key cross-check is bounded; Spark plans
    * it as an ordinary shuffled/broadcast hash join on the key. Exactly
    * one version matches per fact (chains partition the sequence axis).
    */
  def temporalJoin(
      facts: DataFrame,
      history: DataFrame,
      keyCol: String,
      factSeqCol: String): DataFrame = {
    val h = history.withColumnRenamed(keyCol, "__hk")
    facts.join(h,
      facts(keyCol) === h("__hk") &&
        facts(factSeqCol) >= h("valid_from") &&
        (h("valid_to").isNull || facts(factSeqCol) < h("valid_to")),
      "left")
      .drop("__hk")
  }

  /** Incremental materialized-view maintenance with RETRACTIONS (the
    * differential/Flink changelog model): the view is a per-key
    * (n, total) aggregate; a delta stream of (keys, value, weight) rows
    * — weight +1 for insert, −1 for retraction — folds in WITHOUT
    * touching the unchanged keys' source rows:
    *
    *   n' = n + Σ w,   total' = total + Σ w·v,   rows with n' = 0 vanish.
    *
    * This is the algebra that makes a 100 TB aggregate maintainable: the
    * work per refresh is O(|delta| + |touched keys|), never a rescan,
    * and the spec pins update(view, delta) == rebuild(source ⊎ delta).
    * Count and sum are the self-maintainable kernel; avg = total/n is
    * derived, and min/max (not self-maintainable under retraction)
    * would need the per-key detail relation — the standard MV taxonomy.
    *
    * Plan: one shuffle each for the delta pre-aggregate and the
    * key-keyed combine; partial aggregation below both exchanges.
    */
  def updateSumCount(
      view: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      valueCol: String,
      weightCol: String = "w"): DataFrame = {
    val kcols = keys.map(col)
    val deltaAgg = delta
      .groupBy(kcols: _*)
      .agg(
        sum(col(weightCol)).cast("long").as("n"),
        sum(col(weightCol) * col(valueCol)).as("total"))
    view
      .select(kcols :+ col("n") :+ col("total"): _*)
      .unionByName(deltaAgg)
      .groupBy(kcols: _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      .where(col("n") > 0)
  }

  /** Build the (keys, n, total) view [[updateSumCount]] maintains. */
  def sumCountView(source: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    source
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))

  /** Corpus snapshot diff — dataset VERSIONING's changelog: which
    * documents were added, removed, or content-changed between two corpus
    * versions (the review/replicate/rollback artifact
    * [[graft.operators.InvertedIndex.diffIndexes]] produces for the
    * index, at the source-data level).
    *
    * Texts compare by md5, so the shuffle moves (id, 32-byte hash), never
    * document payloads; one full-outer join on the id; unchanged docs —
    * the overwhelming majority between adjacent versions — are dropped
    * BEFORE the result materializes, so the output is change-sized.
    *
    * Returns (idCol, status ∈ added|removed|changed).
    */
  def corpusDiff(
      oldCorpus: DataFrame,
      newCorpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val o = oldCorpus.select(col(idCol), md5(col(textCol)).as("__oh"))
    val n = newCorpus.select(col(idCol), md5(col(textCol)).as("__nh"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") =!= col("__nh"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }
}
