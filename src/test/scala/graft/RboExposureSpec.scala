package graft

import graft.operators.{Dedup, Search}

/** [[Search.rboEval]] and [[Dedup.dupExposure]]: hand-computed values,
  * identity/disjoint edges, and the weight-table identity.
  */
class RboExposureSpec extends SparkSpec {
  import spark.implicits._

  test("rboEval reproduces the hand-computed overlap at k=3, p=0.5") {
    // weights: w(1)=2/3, w(2)=1/6, w(3)=1/24·... computed: Σ(0.5·0.5^{d−1}/d)
    // A=[1,2,3], B=[1,3,4]: doc 1 at m=1 (w=0.666667), doc 3 at m=3
    // (w=0.041667) → rbo = 0.708333
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((1L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "rank")
    val r = Search.rboEval(a, b, k = 3, p = 0.5).collect().head
    assert(r.getAs[Long]("n_shared") == 2)
    assert(r.getAs[Double]("rbo_r") == 0.708333, s"got ${r.getAs[Double]("rbo_r")}")
  }

  test("rboEval: identical rankings hit the truncated maximum; disjoint hit 0") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val same = Search.rboEval(a, a, k = 3, p = 0.5).collect().head
    // truncated max = (1−p)Σp^{d−1} = 0.5 + 0.25 + 0.125
    assert(same.getAs[Double]("rbo_r") == 0.875)
    val c = Seq((7L, 1), (8L, 2), (9L, 3)).toDF("doc_id", "rank")
    val none = Search.rboEval(a, c, k = 3, p = 0.5).collect().head
    assert(none.getAs[Long]("n_shared") == 0 && none.getAs[Double]("rbo_r") == 0.0)
  }

  test("dupExposure: copied docs read 1.0, the unique doc reads 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val got = Dedup.dupExposure(docs, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (2L, 2L, 1.0) && got(2L) == (2L, 2L, 1.0), s"copies: $got")
    assert(got(3L) == (3L, 0L, 0.0), s"unique: $got")
  }

  test("dupExposure: partial overlap scores the shared fraction exactly") {
    // doc 1: tokens a..f → shingles {a-e, b-f}; doc 2 shares ONLY b-f
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "bb cc dd ee ff gg")
    ).toDF("doc_id", "text")
    val got = Dedup.dupExposure(docs, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (2L, 1L, 0.5) && got(2L) == (2L, 1L, 0.5), s"got $got")
  }

  test("dupExposure: partial-agg df form == the r12 window-count form, and the plan shows it") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // equality pin for the round-13 reshape: the shingle doc-frequency now
    // comes from groupBy(sh).count joined back (map-side combinable, and a
    // skewed join AQE can split) instead of a whole-partition window count
    // (no partial agg, unsplittable hot-shingle task). Same output, better
    // plan — prove BOTH on real corpus data.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.dupExposure(docs, k = 5)
    // the r12 form, inlined verbatim
    val sh = graft.functions.TextAnalysis.withShingles(docs, "text", 5)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val want = sh
      .withColumn("sdf", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("sdf") > 1).cast("long")).as("n_shared"))
      .withColumn("exposure_r", graft.functions.Portable.pround(
        col("n_shared").cast("double") / col("n_shingles"), 4))
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(got) == rows(want), "reshaped dupExposure must equal the window form")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window count may remain in the df path:\n$plan")
    // the df count must partially aggregate below its exchange: two
    // HashAggregates on the shingle key (partial + final)
    assert("HashAggregate\\(keys=\\[sh".r.findAllIn(plan).length >= 2,
      s"shingle df must be a partial-agg groupBy count:\n$plan")
  }

  test("dupExposure hashKeys mode == exact-string mode on real corpora") {
    import org.apache.spark.sql.functions._
    // the cluster default (xxhash64 shuffle keys, 8 bytes on the wire)
    // must be output-identical to the oracled exact-string form whenever
    // no 64-bit collision occurs — certain at these vocabulary sizes
    // (expected colliding pairs ≈ v²/2⁶⁵)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    for (path <- Seq("/root/testdata/sf0.001/documents.parquet",
                     "/root/testdata/sf0.01/documents.parquet")) {
      val docs = spark.read.parquet(path)
      val exact  = Dedup.dupExposure(docs, k = 5)
      val hashed = Dedup.dupExposure(docs, k = 5, hashKeys = true)
      assert(rows(hashed) == rows(exact), s"hashed-key exposure diverged on $path")
    }
    // and the hashed plan really shuffles longs, not strings: its shingle
    // aggregate key must be xxhash64-typed (bigint), with no string sh
    val hashedPlan = Dedup.dupExposure(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      k = 5, hashKeys = true).queryExecution.analyzed.schema
    // output schema is identical — the key swap is internal
    assert(hashedPlan.fieldNames.toSeq ==
      Seq("doc_id", "n_shingles", "n_shared", "exposure_r"))
  }
}
