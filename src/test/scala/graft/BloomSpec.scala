package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Bloom-filter decontamination: no false negatives ever (the exact
  * contaminated set is always a subset of the flagged set), false-positive
  * volume bounded by the configured fpp. Sketch internals aren't
  * SQL-expressible, so like SketchSpec this pins the sketch against the
  * EXACT operator ([[TextAnalysis.contaminationOverlap]]) on the same data.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  // benchmark = a slice of the corpus itself → guaranteed real contamination
  private lazy val benchmark = docs.where(col("doc_id") % 25 === 0)

  test("bloom flags are a superset of exact contamination, with bounded false positives") {
    val exact = TextAnalysis
      .contaminationOverlap(docs, benchmark, k = 5)
      .select("doc_id").as[Long].collect().toSet
    val flagged = TextAnalysis
      .bloomDecontaminate(docs, benchmark, k = 5, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(flagged),
      s"false negatives: ${(exact -- flagged).take(5)} — Bloom filters cannot miss")
    val clean = docs.count() - exact.size
    val falsePos = (flagged -- exact).size
    // each clean doc probes ~|shingles| times at fpp=1%; docs average ~40
    // shingles, so expected per-doc flag probability is ≤ ~1-(1-.01)^40 ≈ 33%.
    // The observed rate runs far lower (shared-vocabulary shingles collide
    // with the benchmark for REAL reasons first); 50% is the alarm bound.
    assert(falsePos.toDouble / clean <= 0.5,
      s"$falsePos false positives over $clean clean docs")
  }

  test("decontaminate drops exactly the flagged docs; survivors carry their overlap") {
    val corpus = docs.where(col("doc_id") % 25 =!= 0)
    val report = TextAnalysis
      .contaminationOverlap(corpus, benchmark, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis
      .decontaminate(corpus, benchmark, k = 5, maxOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = corpus.count()
    assert(kept.size.toLong == total - report.count(_._2 >= 1),
      "every doc with >= maxOverlap shared k-grams is gone, nothing else")
    assert(report.keySet.intersect(kept.keySet).isEmpty,
      "at maxOverlap=1 no reported doc survives")
    assert(kept.values.forall(_ == 0L), "survivors carry overlap 0")
    // looser threshold keeps the low-overlap docs, with their counts
    val loose = TextAnalysis
      .decontaminate(corpus, benchmark, k = 5, maxOverlap = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose.size.toLong == total)
    report.foreach { case (id, n) => assert(loose(id) == n, s"audit trail for $id") }
  }

  test("zero-overlap corpus: flagged set is pure false positives and stays small at tight fpp") {
    val foreign = Seq((1L, "zzqx wvvk pprt mmnn ccdd eeff gghh iijj kkll"),
                      (2L, "aabb ccdd eeff gghh iijj kkll mmnn oopp qqrr"))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis
      .bloomDecontaminate(foreign, benchmark, k = 5, fpp = 0.001)
    // 2 docs × ~5 probes at 0.1% — a flag here is a 1-in-200 fluke; assert
    // the hard guarantee instead: n_maybe never exceeds the probe count
    flagged.as[(Long, Long)].collect().foreach { case (_, m) => assert(m <= 5) }
  }
}
