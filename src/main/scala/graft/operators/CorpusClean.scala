package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextAnalysis}

/** Corpus-cleaning operators a large-scale training-data pipeline runs
  * between raw crawl and tokenizer: repeated-span (boilerplate) detection,
  * PII redaction, LM-score quality bucketing, and token-budget mixture
  * sampling. Each is a declarative DataFrame pipeline with a DuckDB-oracle
  * mirror in SparkEntry.
  *
  * Scale notes per operator are inline; the common theme is that every
  * corpus-wide structure built here (boilerplate span set, per-lang
  * quantile boundaries, budget table) is orders of magnitude smaller than
  * the corpus, so each pipeline is one wide aggregate + one broadcast-able
  * join back onto the documents — no self-joins, no windows over
  * unbounded partitions.
  */
object CorpusClean {

  /** Repeated-span (boilerplate) detection, the n-gram form of C4's
    * "remove any line seen in more than one document" rule (the corpus has
    * no line structure, so spans are word k-grams): a span is boilerplate
    * when it appears in at least `minDocs` DISTINCT documents.
    *
    * Returns (gram, n_docs). Shingles are distinct per doc before the
    * count, so `count(*)` IS the document frequency — one exchange on the
    * gram, partial counts map-side. At 100 TB the HAVING keeps only the
    * (tiny) repeated tail; the full gram stream is never materialized.
    */
  def boilerplateSpans(
      docs: DataFrame,
      k: Int = 2,
      minDocs: Long = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextAnalysis
      .withShingles(docs, textCol, k, "__sh")
      .select(col(idCol), explode_outer(col("__sh")).as("gram"))
      .where(col("gram").isNotNull)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** Per-document boilerplate exposure: how many of the doc's distinct
    * k-grams are corpus boilerplate (by [[boilerplateSpans]]), and the
    * fraction they make up — the per-doc signal a cleaning pass filters or
    * rewrites on. Returns (idCol, n_grams, n_bp, bp_frac).
    *
    * The span set is df-filtered and small, so the join back onto the
    * exploded gram stream broadcasts. SINGLE corpus pass on the flag side:
    * `n_grams` travels WITH each exploded gram row (it is constant per doc,
    * so `max` recovers it in the same aggregate that counts hits), and the
    * span membership test is a broadcast LEFT OUTER join whose match marker
    * is counted — one Generate, one broadcast join, one agg; the earlier
    * two-branch form re-evaluated the whole shingle expression over the
    * corpus a second time just to recover `n_grams`. Docs with zero grams
    * survive through `explode_outer`'s null row (marker never matches).
    */
  def boilerplateFlag(
      docs: DataFrame,
      k: Int = 2,
      minDocs: Long = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = broadcast(
      boilerplateSpans(docs, k, minDocs, idCol, textCol)
        .select(col("gram"), lit(1).as("__hit")))
    TextAnalysis
      .withShingles(docs, textCol, k, "__sh")
      .select(col(idCol), size(col("__sh")).as("n_grams"), explode_outer(col("__sh")).as("gram"))
      .join(spans, Seq("gram"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        max(col("n_grams")).cast("long").as("n_grams"),
        count(col("__hit")).as("n_bp"))
      .select(
        col(idCol),
        col("n_grams"),
        col("n_bp"),
        Portable.pround(
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(col("n_bp").cast("double") / col("n_grams").cast("double")),
          4).as("bp_frac"))
  }

  /** PII patterns shared with the oracle SQL: RE2-safe (no lookaround, no
    * backrefs) so Java regex and DuckDB RE2 agree byte-for-byte on ASCII.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val Ipv4Re  = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, NANP-style phone numbers and 10.x IPv4 addresses with
    * typed placeholders. Order matters: emails first (an email contains
    * dots a lax IP pattern could nibble), then phones, then IPs. Pure
    * per-row codegen'd regexp_replace chain — map-side at any scale.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Count of PII matches (for audit metrics), same patterns as
    * [[redactPii]].
    */
  def piiMatchCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(c, lit(PhoneRe), lit(0))) +
      size(regexp_extract_all(c, lit(Ipv4Re), lit(0)))

  /** Markup patterns shared with the oracle SQL — RE2-safe like the PII
    * set (no lookaround, no backrefs; inline `(?is)` flags and non-greedy
    * `.*?` are RE2 features), so Java regex and DuckDB RE2 agree
    * byte-for-byte on ASCII.
    */
  val ScriptRe  = "(?is)<script[^>]*>.*?</script>"
  val StyleRe   = "(?is)<style[^>]*>.*?</style>"
  val CommentRe = "(?s)<!--.*?-->"
  val TagRe     = "<[^>]+>"
  val NumEntRe  = "&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};"

  /** HTML/markup stripping — the FIRST operator of a raw-crawl cleaning
    * pipeline (the C4/CCNet shape: no quality signal is meaningful while
    * tags and entities are still in the text). Pure map-side
    * regexp/replace chain like [[redactPii]] — codegen'd, no shuffle, no
    * UDF, linear per row at any scale.
    *
    * Order is load-bearing and mirrored exactly by the oracle SQL:
    *   1. `<script>`/`<style>` blocks WITH their content, then comments
    *      (their bodies are not prose);
    *   2. every remaining tag → a SPACE (tag boundaries are word
    *      boundaries: `<p>a</p><p>b</p>` must not fuse `ab`);
    *   3. entity decoding AFTER tag removal, so a decoded `&lt;` can
    *      never fabricate a tag: the common named entities, then numeric
    *      entities → space, and `&amp;` LAST so `&amp;lt;` decodes to
    *      the literal text `&lt;` (single-pass decoding, the HTML5 rule);
    *   4. whitespace collapse + trim.
    */
  def stripMarkup(c: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(c,
      ScriptRe, " "), StyleRe, " "), CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val named = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
      .foldLeft(noTags) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }
    val decoded = replace(regexp_replace(named, NumEntRe, " "), lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** CCNet-style head/middle/tail quality bucketing: score every document
    * with the corpus-derived unigram LM ([[TextAnalysis.unigramLogProbScore]]),
    * then cut each language's score distribution into `nb` equal-count
    * buckets (bucket 1 = head = most-fluent). Returns
    * (idCol, lang, mean_lp rounded, bucket, tier) — row-identical to
    * `ntile(nb) OVER (PARTITION BY lang ORDER BY r_lp DESC, id)`, which is
    * what the DuckDB oracle still runs.
    *
    * DISTRIBUTED ntile (the round-6 form was one corpus-sized window task
    * per language): each row's per-language rank decomposes as
    *
    *   rank = (#rows with a strictly HIGHER score)            [base]
    *        + row_number among the ties, ordered by id        [local]
    *
    * and ntile is pure arithmetic on (rank, n). `base` and `n` come from a
    * count aggregate keyed by (lang, score) — scores are 4-dp-quantized in
    * a bounded range, so that relation is score-resolution-bounded METADATA
    * (≤ ~10^5·langs rows regardless of corpus size: the same trick as
    * [[Packing.packByOffset]]'s chunk subtotals), its per-lang windows sort
    * metadata, and it broadcasts back. The only document-side window
    * partitions by (lang, score): one tie group per task, never a whole
    * language.
    */
  def qualityBuckets(docs: DataFrame, nb: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = TextAnalysis
      .unigramLogProbScore(
        Tokenize.tokens(docs, textCol, Seq(idCol)), idCol)
      .withColumn("r_lp", Portable.pround(col("mean_lp"), 4))
    val rows = docs
      .select(col(idCol), col("lang"))
      .join(scored.select(col(idCol), col("r_lp")), Seq(idCol))
    tieredByScore(rows, nb, idCol)
      .select(col(idCol), col("lang"), col("r_lp").as("mean_lp"), col("bucket"), col("tier"))
  }

  /** The distributed-ntile tail of [[qualityBuckets]], shared with
    * [[knPplBuckets]]: adds (bucket, tier) to `rows` carrying
    * (idCol, lang, r_lp [4-dp-quantized score], …) — row-identical to
    * `ntile(nb) OVER (PARTITION BY lang ORDER BY r_lp DESC, id)`. Extra
    * columns pass through untouched.
    */
  private def tieredByScore(rows: DataFrame, nb: Int, idCol: String): DataFrame = {
    // pass 1: per-(lang, score) tie counts → cumulative higher-score count
    // (base) + language total (n); metadata-scale windows
    val wScores = Window.partitionBy(col("lang")).orderBy(desc("r_lp"))
    val wLang   = Window.partitionBy(col("lang"))
    val bases = rows
      .groupBy(col("lang"), col("r_lp"))
      .agg(count(lit(1)).as("__tie"))
      .withColumn("__base", sum(col("__tie")).over(wScores) - col("__tie"))
      .withColumn("__n", sum(col("__tie")).over(wLang))
      .select(col("lang"), col("r_lp"), col("__base"), col("__n"))
    // pass 2: bounded local window (one tie group per partition), then
    // ntile arithmetic: with q = n div nb and m = n mod nb, the first m
    // buckets hold q+1 rows and the rest hold q
    val wLocal = Window.partitionBy(col("lang"), col("r_lp")).orderBy(col(idCol))
    val rank = col("__base") + row_number().over(wLocal)
    val q    = floor(col("__n") / nb).cast("long")
    val m    = (col("__n") % nb).cast("long")
    val bucket = when(rank <= m * (q + 1), floor((rank - 1) / (q + 1)) + 1)
      .otherwise(m + floor((rank - 1 - m * (q + 1)) / q) + 1)
      .cast("int")
    rows
      .join(broadcast(bases), Seq("lang", "r_lp"))
      .withColumn("bucket", bucket)
      .withColumn(
        "tier",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === nb, "tail")
          .otherwise("middle"))
      .drop("__base", "__n")
  }

  /** The production CCNet filter stage proper: bucket DOCUMENTS by
    * Kneser–Ney bigram-LM perplexity into per-language head/middle/tail
    * terciles — [[qualityBuckets]]'s shape with the better LM
    * ([[TextAnalysis.knBigramLogProbScore]]; CCNet's KenLM stage is
    * modified KN). Perplexity = exp(−mean log-prob), so head = lowest
    * perplexity = highest mean_lp; ordering runs on the 4-dp-rounded
    * score (doc-id tiebreak) so both engines tier identically. Documents
    * with <2 tokens have no bigrams and no defined perplexity — CCNet
    * drops them; here they surface as bucket 0 / tier 'short' instead of
    * vanishing.
    *
    * Scale shape: the KN scorer's aggregates (type-relation-bounded) plus
    * [[tieredByScore]]'s metadata-windowed ntile — no per-language global
    * sort anywhere.
    */
  def knPplBuckets(docs: DataFrame, nb: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rows = docs
      .select(col(idCol), col("lang"))
      .join(TextAnalysis.knBigramLogProbScore(docs, idCol, textCol), Seq(idCol))
      .withColumn("r_lp", col("mean_lp"))
    val tiered = tieredByScore(rows.where(col("n_big") > 0), nb, idCol)
    val shorts = rows
      .where(col("n_big") === 0)
      .withColumn("bucket", lit(0).cast("int"))
      .withColumn("tier", lit("short"))
    tiered.unionByName(shorts)
      .select(col(idCol), col("lang"), col("n_big"), col("mean_lp"),
        Portable.pround(exp(-col("mean_lp")), 4).as("ppl_r"),
        col("bucket"), col("tier"))
  }

  /** Token-budget mixture sampling: each language contributes documents —
    * in a deterministic pseudo-random order (md5 of the id, rerun-stable
    * like [[Sampling]]) — until its whitespace-token budget is exhausted; a
    * document is taken iff it STARTS under budget (the standard
    * greedy-prefix rule, so the last doc may overshoot). Returns the kept
    * docs with (idCol, lang, n_ws, cum_ws).
    *
    * DISTRIBUTED prefix sum (the round-6 form was one corpus-sized window
    * task per language): the md5 order key is uniform by construction, so
    * its first `chunkHexDigits` hex chars cut each language into 16^digits
    * balanced chunks that are LEXICALLY MONOTONE in the order key — the
    * [[Packing.packByOffset]] two-pass shape. Pass 1 aggregates per-chunk
    * token subtotals (metadata: 16^digits rows per language) and turns them
    * into chunk base offsets with a metadata-scale window; pass 2 computes
    * the local running sum inside each (lang, chunk) — ~N/16^digits rows
    * per task — and base + local is the exact global cumulative sum.
    * Unknown languages (no budget row) contribute nothing. Raise
    * `chunkHexDigits` with corpus size (4 ⇒ 65536 chunks at 100 TB).
    */
  def mixtureSample(
      docs: DataFrame,
      budgets: Map[String, Long],
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkHexDigits: Int = 2): DataFrame = {
    require(chunkHexDigits >= 1 && chunkHexDigits <= 8,
      s"chunkHexDigits ($chunkHexDigits) must be in [1, 8]")
    val spark = docs.sparkSession
    import spark.implicits._
    val budgetDf = broadcast(budgets.toSeq.toDF("lang", "budget"))
    val rows = docs
      .select(
        col(idCol),
        col("lang"),
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_ws"),
        md5(col(idCol).cast("string")).as("rk"))
      .join(budgetDf, Seq("lang"))
      .withColumn("__chunk", substring(col("rk"), 1, chunkHexDigits))
    // pass 1: per-(lang, chunk) subtotals → chunk base offsets via a
    // metadata-scale window (16^digits rows per language)
    val wChunks = Window.partitionBy(col("lang")).orderBy(col("__chunk"))
    val bases = rows
      .groupBy(col("lang"), col("__chunk"))
      .agg(sum(col("n_ws")).as("__ct"))
      .withColumn("__base", sum(col("__ct")).over(wChunks) - col("__ct"))
      .select(col("lang"), col("__chunk"), col("__base"))
    // pass 2: bounded local running sum; (chunk ASC, rk ASC, id ASC) is the
    // global (rk, id) order because the chunk is a prefix of rk
    val wLocal = Window
      .partitionBy(col("lang"), col("__chunk"))
      .orderBy(col("rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .join(broadcast(bases), Seq("lang", "__chunk"))
      .withColumn("cum_ws", col("__base") + sum(col("n_ws")).over(wLocal))
      .where(col("cum_ws") - col("n_ws") < col("budget"))
      .select(col(idCol), col("lang"), col("n_ws"), col("cum_ws"))
  }
}
