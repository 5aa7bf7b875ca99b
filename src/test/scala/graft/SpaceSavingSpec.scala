package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenize

/** [[graft.plans.SpaceSavingAgg]] (`spacesaving_topk`): exactness when
  * capacity covers the key space, and the classical SpaceSaving guarantees
  * under eviction across a real multi-partition merge tree.
  */
class SpaceSavingSpec extends AnyFunSuite {

  // own extensions-enabled session (ExtensionsSpec pattern): the shared
  // TestSpark session does not carry GraftExtensions' SQL functions
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-ss-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("capacity >= distinct keys: sketch is exact with zero error") {
    val toks = Tokenize.tokens(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", Seq("doc_id"))
    val got = toks
      .agg(expr("spacesaving_topk(word, 64)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = toks.groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.length == want.size, "every key stored when capacity covers vocab")
    got.foreach { case (k, est, err) =>
      assert(est == want(k) && err == 0L, s"$k: est=$est err=$err vs exact=${want(k)}")
    }
  }

  test("under eviction: overestimate invariant, per-key error bound, heavy-hitter recall") {
    import spark.implicits._
    val capacity = 16
    // 5 heavy keys (1000+i occurrences) in a sea of 500 singleton keys —
    // far over capacity, spread round-robin over 8 partitions so the
    // final sketch is a REAL merge of 8 partial sketches
    val heavy = (0 until 5).flatMap(i => Seq.fill(1000 + i)(s"heavy_$i"))
    val light = (0 until 500).map(i => s"light_$i")
    val data  = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle(heavy ++ light)
    val df = data.toDF("k").repartition(8).localCheckpoint(true)
    val n  = data.length.toLong
    val truth = data.groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = df
      .agg(expr(s"spacesaving_topk(k, $capacity)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.key"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(got.length == capacity, s"sketch stores exactly capacity entries, got ${got.length}")
    got.foreach { case (k, est, err) =>
      val t = truth(k)
      assert(est >= t, s"$k: overestimate invariant violated (est=$est < true=$t)")
      assert(est - t <= err, s"$k: error tracking unsound (est=$est true=$t err=$err)")
      assert(err <= n / capacity + 8, // +8: per-partial rounding across the 8-way merge
        s"$k: err=$err exceeds the N/capacity bound (${n / capacity})")
    }
    // recall: every key with true count > 2N/capacity must be reported
    val reported = got.map(_._1).toSet
    truth.filter(_._2 > 2 * n / capacity).keys.foreach { k =>
      assert(reported(k), s"heavy key $k (true=${truth(k)}) missing from the sketch")
    }
  }
}
