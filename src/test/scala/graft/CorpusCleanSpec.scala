package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusClean

/** Unit-level invariants for the corpus-cleaning operators; cross-engine
  * value equality is separately pinned by the DuckDB oracles
  * (q_boilerplate_*, q_pii_redact, q_quality_buckets, q_mixture_sample).
  */
class CorpusCleanSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("redactPii replaces exactly the crafted PII bytes, in order") {
    val df = Seq(
      "mail me at bob.smith@corp.example.org now",
      "call +1-555-0142 or visit 10.2.3.44 today",
      "clean text with no secrets at all",
      "two mails a@b.io c.d@e.fr one ip 10.0.0.1").toDF("t")
    val out = df.select(CorpusClean.redactPii(col("t"))).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> now")
    assert(out(1) == "call <PHONE> or visit <IP> today")
    assert(out(2) == "clean text with no secrets at all")
    assert(out(3) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    val counts = df.select(CorpusClean.piiMatchCount(col("t"))).as[Int].collect()
    assert(counts.toSeq == Seq(1, 2, 0, 3))
  }

  test("stripMarkup: blocks gone with content, tags are word boundaries, entities decode once") {
    val cases = Seq(
      // script/style bodies removed entirely, not just the tags
      ("<script>var a = '<p>not text</p>';</script>keep", "keep"),
      ("<style type=\"text/css\">p { color: red }</style>keep", "keep"),
      ("<SCRIPT SRC='x.js'>\nmultiline();\n</SCRIPT>ok", "ok"),
      // comments (multiline too) removed with content
      ("a<!-- hidden\ntext -->b", "a b"),
      // tags become SPACES so adjacent words don't fuse
      ("<p>alpha</p><p>beta</p>", "alpha beta"),
      ("<div class='x' data-k=\"v\">inner</div>", "inner"),
      // named entities decode; &amp; decodes LAST so &amp;lt; stays literal
      ("fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x", "fish & chips <tag> \"q\" 's' x"),
      ("literal &amp;lt; stays", "literal &lt; stays"),
      // numeric entities (dec + hex) collapse to whitespace
      ("a&#65;b &#x2019; c", "a b c"),
      // decoded angle brackets do NOT create strippable tags
      ("&lt;p&gt;still here&lt;/p&gt;", "<p>still here</p>"),
      // plain text: only whitespace normalization
      ("no  markup\there", "no markup here"),
      ("", ""))
    val got = cases.map(_._1).zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "raw")
      .select(col("i"), CorpusClean.stripMarkup(col("raw")).as("clean"))
      .orderBy("i").collect().map(_.getString(1))
    cases.zipWithIndex.foreach { case ((raw, expected), i) =>
      assert(got(i) == expected, s"case $i '$raw': got '${got(i)}' expected '$expected'")
    }
  }

  test("boilerplateFlag: counts bounded by gram count; a planted span is flagged") {
    // 30 docs share the bigram "alpha beta"; 5 unique docs don't. Suffix
    // words are letter-distinct per doc (digits would be stripped by the
    // tokenizer, collapsing them into shared words).
    val planted = (1 to 30).map(i => (i.toLong, s"alpha beta ${"u" * i}x ${"t" * i}y")) ++
      (31 to 35).map(i => (i.toLong, s"${"s" * i}a ${"w" * i}b ${"o" * i}c"))
    val df = planted.toDF("doc_id", "text")
    val flags = CorpusClean
      .boilerplateFlag(df, k = 2, minDocs = 20)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(flags.size == 35)
    flags.foreach { case (_, (nGrams, nBp)) => assert(nBp <= nGrams) }
    (1 to 30).foreach(i => assert(flags(i.toLong)._2 == 1, s"doc $i must flag 'alpha beta'"))
    (31 to 35).foreach(i => assert(flags(i.toLong)._2 == 0))
    // and the span list is exactly the planted bigram
    val spans = CorpusClean.boilerplateSpans(df, k = 2, minDocs = 20)
      .as[(String, Long)].collect().toSeq
    assert(spans == Seq(("alpha beta", 30L)))
  }

  test("qualityBuckets: per-language tercile sizes differ by at most one, tiers consistent") {
    val b = CorpusClean.qualityBuckets(docs, nb = 3)
    val sizes = b.groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    sizes.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val perBucket = (1 to 3).map(i => sizes.getOrElse((lang, i), 0L))
      assert(perBucket.max - perBucket.min <= 1, s"$lang terciles $perBucket")
    }
    val tiers = b.select("bucket", "tier").distinct().as[(Int, String)].collect().toMap
    assert(tiers == Map(1 -> "head", 2 -> "middle", 3 -> "tail"))
  }

  test("mixtureSample: greedy prefix rule — every kept doc starts under budget, rerun-stable") {
    val budgets = Map("en" -> 3000L, "de" -> 1000L, "es" -> 1000L, "fr" -> 1000L, "zh" -> 500L)
    val kept = CorpusClean.mixtureSample(docs, budgets)
    val rows = kept.as[(Long, String, Long, Long)].collect()
    rows.foreach { case (_, lang, nWs, cum) =>
      assert(cum - nWs < budgets(lang), s"doc starts at ${cum - nWs} >= budget ${budgets(lang)}")
    }
    // per-lang: all but the last kept doc end under budget too (greedy prefix)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val overshooters = rs.count(_._4 >= budgets(lang))
      assert(overshooters <= 1, s"$lang has $overshooters docs ending over budget")
    }
    // deterministic: a second run keeps the identical id set
    val again = CorpusClean.mixtureSample(docs, budgets).select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == rows.map(_._1).sorted.toSeq)
  }
}
