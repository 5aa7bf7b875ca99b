package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Closes the loop on [[Dedup.lshPlan]]'s own finding (r17 verdict task 6):
  * the planner reports the shipped b=8,r=2 default as recall-leaning while
  * the equal-weight FP+FN argmin at 16 hashes / threshold 0.5 is (4,4).
  * This spec makes the default a TESTED decision instead of a dangling
  * observation:
  *
  *  - the shipped config's false-negative mass is pinned ≤ 0.007 — the
  *    recall-leaning property is the reason it ships (banding FNs never
  *    reach verification; banding FPs are discarded there for free);
  *  - the planner's argmin is pinned at (4,4) and exposed as
  *    [[Dedup.plannedBands]], so a consumer preferring balanced cost can
  *    adopt planner-driven banding as a drop-in `bands` argument;
  *  - [[Dedup.minhashCandidates]] run AT the planner's choice still finds
  *    a planted duplicate pair (identical docs share every band key at any
  *    factorization — deterministic).
  */
class LshPlanDefaultSpec extends SparkSpec {
  import spark.implicits._

  private lazy val plan = Dedup.lshPlan(spark, numHashes = 16, threshold = 0.5)
    .collect()
    .map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getDouble(3), r.getDouble(4), r.getInt(6)))
    .toMap

  test("shipped default (8,2): FN mass <= 0.0075 at threshold 0.5 — recall-leaning by design") {
    val (fp, fn, _) = plan((8, 2))
    // the planner's exact figure is 0.007419 (the verdict's "0.007" rounded)
    assert(fn <= 0.0075, s"shipped config FN mass $fn exceeds the pinned 0.0075 bound")
    // the accepted price: more verify-stage work than the argmin, never
    // fewer true pairs — fp strictly above the (4,4) row's
    assert(fp > plan((4, 4))._1,
      s"recall-leaning means paying FP for FN: fp=$fp vs argmin fp=${plan((4, 4))._1}")
  }

  test("equal-weight argmin is (4,4), exposed via plannedBands") {
    assert(plan((4, 4))._3 == 1, s"expected (4,4) flagged is_opt, plan: $plan")
    assert(plan.values.map(_._3).sum == 1, "exactly one argmin row")
    assert(Dedup.plannedBands(spark, numHashes = 16, threshold = 0.5) == 4)
  }

  test("minhashCandidates at the planner's (4,4) choice still finds a planted duplicate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Dedup
      .minhashCandidates(docs, numHashes = 16,
        bands = Dedup.plannedBands(spark, numHashes = 16, threshold = 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), s"expected exactly the planted pair, got ${got.toSeq}")
  }
}
