package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Tokenize

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, shingling and document
  * fingerprinting. All pure codegen'd Column expressions (no UDFs), each
  * designed to be oracle-expressible in ANSI SQL.
  *
  * Everything here is per-row (narrow): at 100 TB these run map-side inside
  * the parquet scan stage with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace token count (splitting an empty string yields 1, matching
    * SQL regexp_split semantics on both engines).
    */
  def wsTokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** Count of alphabetic tokens surviving the reference tokenizer. */
  def alphaTokenCount(text: Column): Column = size(Tokenize.tokenArray(text))

  /** BPE-ish subword proxy: maximal alpha or digit runs (a cheap, portable
    * stand-in for a real subword tokenizer's token count).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+"), lit(0)))

  /** Default English-ish stopword list used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Fraction of cleaned tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(text: Column): Column = {
    val toks  = Tokenize.tokenArray(text)
    val stops = filter(toks, w => w.isin(Stopwords: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Heuristic quality score in [0,1]:
    * 0.4 * min(nTokens/100, 1)  — enough content
    * + 0.3 * alphaRatio         — mostly clean words
    * + 0.3 * (1 - stopRatio)    — not boilerplate
    */
  def qualityScore(text: Column): Column = {
    val nWs    = wsTokenCount(text).cast("double")
    val nAlpha = alphaTokenCount(text).cast("double")
    val alphaRatio = nAlpha / greatest(nWs, lit(1.0))
    lit(0.4) * least(nWs / 100.0, lit(1.0)) +
      lit(0.3) * alphaRatio +
      lit(0.3) * (lit(1.0) - stopwordRatio(text))
  }

  /** Disjoint per-language marker words for the n-gram language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of"),
    "fr" -> Seq("le", "et", "dans", "les"),
    "de" -> Seq("der", "und", "nicht", "das"),
    "es" -> Seq("el", "y", "que", "los"))

  /** Language-ID over a token stream: argmax of marker-word hits with a
    * deterministic tie-break (hits DESC, lang ASC); docs with zero marker
    * hits get "unknown". `docs` needs (idCol, textCol).
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val markerOf = LangMarkers.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, words)) => when(col("word").isin(words: _*), lit(lang)).otherwise(acc)
    }
    val hits = Tokenize
      .tokens(docs, textCol, Seq(idCol))
      .withColumn("ml", markerOf)
      .where(col("ml").isNotNull)
      .groupBy(col(idCol), col("ml"))
      .agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(desc("hits"), asc("ml"))
    val best = hits
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("ml").as("pred0"))
    docs
      .select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("pred0"), lit("unknown")).as("pred_lang"))
  }

  /** Order-preserving word k-gram shingles (distinct). Short docs (<k tokens)
    * collapse to a single whole-document shingle so every doc fingerprints.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = Tokenize.tokenArray(text)
    val grams = transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k))))
    array_distinct(when(size(toks) >= k, grams).otherwise(array(concat_ws(" ", toks))))
  }

  /** Rolling-hash document fingerprint: lexicographic min of md5(shingle) —
    * a winnowing-style content signature, portable across engines because it
    * is pure md5-hex string ordering.
    */
  def fingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(shingles(text, k), s => md5(s)))
}
