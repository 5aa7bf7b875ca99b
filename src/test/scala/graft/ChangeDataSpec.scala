package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeData

/** MERGE semantics of [[ChangeData.applyChangelog]]: latest sequence per
  * key wins; D deletes, U/I upsert (including upsert-to-absent-key); keys
  * the changelog never touches survive unchanged. The one-shot apply must
  * equal folding the changelog in one-event batches — associativity of
  * the MERGE, which is what lets a 100 TB compaction batch arbitrarily.
  */
class ChangeDataSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")

  private def changes = Seq(
    (2L, "b1", 21.0, 1L, "U"),  // plain update
    (3L, "c1", 31.0, 1L, "U"),  // update then...
    (3L, "c2", 32.0, 2L, "D"),  // ...delete: key 3 gone
    (4L, "d1", 41.0, 1L, "D"),  // delete then...
    (4L, "d2", 42.0, 2L, "I"),  // ...re-insert: key 4 reborn with new payload
    (5L, "e", 50.0, 1L, "I"),   // fresh insert
    (6L, "f", 60.0, 1L, "U")    // update to ABSENT key upserts (WHEN NOT MATCHED)
  ).toDF("k", "s", "v", "seq", "op")

  test("latest-seq-wins MERGE: update, delete, re-insert, upsert-to-absent, untouched") {
    val got = ChangeData
      .applyChangelog(base, changes, "k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "b1", 21.0),
      (4L, "d2", 42.0),
      (5L, "e", 50.0),
      (6L, "f", 60.0)))
  }

  test("one-shot apply == sequential per-event folds (MERGE is associative over batches)") {
    val events = changes.orderBy("seq", "k").collect()
    val folded = events.foldLeft(base) { (acc, r) =>
      val one = Seq((r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
        .toDF("k", "s", "v", "seq", "op")
      // each single-event batch re-applies onto the accumulated snapshot
      ChangeData.applyChangelog(acc, one, "k").localCheckpoint(true)
    }
    val oneShot = ChangeData.applyChangelog(base, changes, "k")
    assert(
      folded.collect().map(_.toSeq).toSet == oneShot.collect().map(_.toSeq).toSet)
  }

  test("updateSumCount: incremental == rebuild; keys vanish at n=0 and appear on insert") {
    val source = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val view = ChangeData.sumCountView(source, Seq("k"), "v")
    val delta = Seq(
      ("a", 2.0, -1L),  // retract one of a's rows
      ("b", 5.0, -1L),  // retract b's ONLY row → b vanishes
      ("c", 7.0, 1L),   // brand-new key
      ("c", 9.0, 1L)
    ).toDF("k", "v", "w")
    val got = ChangeData.updateSumCount(view, delta, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 1L, 1.0), ("c", 2L, 16.0)))
    // == rebuilding over the post-delta source
    val rebuilt = ChangeData.sumCountView(
      Seq(("a", 1.0), ("c", 7.0), ("c", 9.0)).toDF("k", "v"), Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == rebuilt)
  }

  test("plan has exactly one exchange (union + max_by agg, no window, no join)") {
    val plan = ChangeData
      .applyChangelog(base, changes, "k")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "MERGE must not use a window")
    assert(!plan.contains("Join"), "MERGE must not use a join")
  }

  test("scdType2: version chains framed by (valid_from, valid_to); D closes without opening") {
    val got = ChangeData.scdType2(base, changes, "k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .toSet
    assert(got == Set(
      (1L, "a", 0L, -1L, true),    // never touched: base version stays open
      (2L, "b", 0L, 1L, false),    // closed by the update...
      (2L, "b1", 1L, -1L, true),   // ...which opens the current version
      (3L, "c", 0L, 1L, false),
      (3L, "c1", 1L, 2L, false),   // closed by the DELETE — key 3 has no current row
      (4L, "d", 0L, 1L, false),    // closed by the delete at seq 1...
      (4L, "d2", 2L, -1L, true),   // ...then reborn by the insert at seq 2
      (5L, "e", 1L, -1L, true),
      (6L, "f", 1L, -1L, true)), got.toString)
  }

  test("scdType2 is_current slice == applyChangelog snapshot (history ⊇ MERGE)") {
    val current = ChangeData.scdType2(base, changes, "k")
      .where(col("is_current"))
      .select("k", "s", "v")
      .collect().map(_.toSeq).toSet
    val snapshot = ChangeData.applyChangelog(base, changes, "k")
      .collect().map(_.toSeq).toSet
    assert(current == snapshot)
  }

  test("temporalJoin: each fact sees the version current at ITS seq; gaps and pre-history are NULL") {
    val hist = ChangeData.scdType2(base, changes, "k")
    val facts = Seq(
      (3L, 0L),   // version "c" [0,1)
      (3L, 2L),   // deleted at 2 -> NULL (not today's value — there is none)
      (4L, 1L),   // deletion GAP [1,2) -> NULL
      (4L, 2L),   // reborn "d2" [2,∞)
      (1L, 5L),   // open-ended current version "a"
      (99L, 0L)   // key with no history at all -> NULL
    ).toDF("k", "fs")
    val got = ChangeData.temporalJoin(facts, hist, "k", "fs")
      .select("k", "fs", "s")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), if (r.isNullAt(2)) null else r.getString(2)))
      .toMap
    assert(got.size == 6, s"exactly one row per fact: $got")
    assert(got((3L, 0L)) == "c" && got((4L, 2L)) == "d2" && got((1L, 5L)) == "a", got.toString)
    assert(got((3L, 2L)) == null && got((4L, 1L)) == null && got((99L, 0L)) == null, got.toString)
  }

  test("corpusDiff: added/removed/changed partition; unchanged docs never surface") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"), (9L, "new doc"))
      .toDF("doc_id", "text")
    val got = ChangeData.corpusDiff(v1, v2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (9L, "added")), got.toString)
  }
}
