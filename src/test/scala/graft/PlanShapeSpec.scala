package graft

import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Tokenize}

/** Pins the SHAPE of the hot plans, not just their results: shuffle count is
  * the thing that decides whether a pipeline survives a 100x scale-up, so a
  * regression that slips in an extra exchange should fail loudly here.
  */
class PlanShapeSpec extends SparkSpec {

  /** Count SHUFFLE exchanges only — BroadcastExchange moves a small table to
    * every executor once and is exactly what we want joins to do.
    */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString).length

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("postings build = exactly one shuffle (hash agg on word)") {
    val postings = Engine.indexFromTable(docs)
    assert(exchanges(postings) == 1,
      s"postings should shuffle once:\n${postings.queryExecution.executedPlan}")
  }

  test("ranked-within-letters index = exactly two shuffles (agg + letter repartition)") {
    val ranked = InvertedIndex.rankedWithinLetters(Engine.indexFromTable(docs))
    assert(exchanges(ranked) == 2,
      s"ranked index should shuffle twice:\n${ranked.queryExecution.executedPlan}")
  }

  test("tokenize + quality metrics are shuffle-free (pure map-side)") {
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id"))
    assert(exchanges(toks) == 0)
    val quality = graft.functions.TextAnalysis.withQualityMetrics(docs, "text")
    assert(exchanges(quality) == 0)
  }

  test("broadcast dim join keeps the fact side shuffle-free") {
    val orders   = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val joined = orders.join(broadcast(customer),
      orders("o_custkey") === customer("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(exchanges(joined) == 0, s"fact side must not shuffle:\n$plan")
  }
}
