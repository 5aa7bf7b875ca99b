package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming corpus-ingest twins for the document-granularity operators —
  * the incremental shape every dedup stage already has for EVENTS
  * (EventStream) and indexes (IndexMaintenanceSpec), here for the
  * paragraph family.
  */
object DocStream {

  case class ParVerdict(doc_id: Long, par_idx: Int, dup: Boolean)

  /** Streaming twin of [[Dedup.paragraphDedup]]'s keeper verdict:
    * first-occurrence-keeps is ORDER-SENSITIVE, which is exactly what
    * keyed state expresses — `flatMapGroupsWithState` keyed by the
    * paragraph content hash carries one long (the min occurrence key seen
    * so far) per distinct paragraph, and each arriving occurrence is
    * judged against it. On an APPEND-ordered ingest (doc ids arrive
    * ascending — the incremental-corpus contract IndexMaintenanceSpec's
    * stages share), the streaming verdicts equal the batch operator's:
    * the batch keeper is the corpus-wide min okey, and in-order arrival
    * means the min-so-far IS the corpus min by the time any later
    * occurrence is judged. Out-of-order ingest shifts "first" to arrival
    * order — the semantics a dedup-on-ingest pipeline actually wants —
    * but then batch parity only holds per delivered prefix.
    *
    * The same function body runs in BATCH (flatMapGroupsWithState on a
    * static Dataset sees each group once with empty state): every
    * occurrence of a hash is judged against the group min — literally the
    * batch operator's verdict. One code path, two execution modes; the
    * parity spec pins them equal.
    *
    * State is one long per DISTINCT paragraph — the same cardinality as
    * the batch keeper relation; for an unbounded stream, age it out with
    * a timeout or snapshot-compact it periodically (the
    * [[EventStream.dedupEvents]] watermark discipline), which trades
    * exactness on ancient re-occurrences for bounded state.
    *
    * Emits one verdict per paragraph OCCURRENCE in Update mode; fold to
    * documents downstream (`groupBy(doc_id)`) exactly as the batch
    * operator does.
    */
  def paragraphVerdicts(
      spark: SparkSession,
      docs: DataFrame,
      parTokens: Int = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): Dataset[ParVerdict] = {
    import spark.implicits._
    require(parTokens >= 1, s"parTokens ($parTokens) must be >= 1")
    val occ = docs
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), w => w =!= lit("")).as("__w"))
      .where(size(col("__w")) >= 1)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, int((size(__w) - 1) / $parTokens))," +
          s" i -> array_join(slice(__w, i * $parTokens + 1, $parTokens), ' '))"))
        .as(Seq("par_idx", "par_text")))
      .select(col(idCol).cast("long"), col("par_idx"),
        sha2(col("par_text"), 256).as("__h"), Dedup.parOkey(idCol).as("__okey"))
      .as[(Long, Int, String, Long)]
    occ
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, ParVerdict](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val batch = rows.toVector
          val mn = math.min(
            state.getOption.getOrElse(Long.MaxValue), batch.map(_._4).min)
          state.update(mn)
          batch.iterator.map(o => ParVerdict(o._1, o._2, o._4 != mn))
      }
  }
}
