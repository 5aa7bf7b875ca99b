package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Denoising-objective TRAINING-DATA TRANSFORMS — the map from clean
  * documents to (input, target) example pairs that pretraining actually
  * consumes:
  *
  *  - [[fim]]: fill-in-the-middle (Bavarian et al., "Efficient Training
  *    of Language Models to Fill in the Middle", 2022) — the PSM
  *    (prefix–suffix–middle) rearrangement code models train on.
  *  - [[spanCorrupt]]: T5-style span corruption (Raffel et al., JMLR
  *    2020) — mask ~density of tokens in short spans, sentinel each span
  *    in the input, emit the spans behind their sentinels as the target.
  *
  * Both are MAP-SIDE over the token array except span corruption's
  * per-document run numbering (a document-partitioned prefix sum —
  * bounded by one document's length, never a corpus axis). All
  * randomness is md5-deterministic ((13-hex/2^52) and (3-hex mod range)
  * slices of one digest per draw), so every example is rerun-stable and
  * the oracle replays the exact cuts, spans and sentinel numbering in
  * SQL — the property that makes the transform auditable and the
  * train/eval split leak-checkable after the fact.
  */
object Denoise {

  private def u52(salt: String, parts: Column*): Column =
    graft.functions.HexSlice.u(md5(concat_ws(":", lit(salt) +: parts: _*)), 1, 13)
      .cast("double") / lit(4503599627370496.0)

  /** Fill-in-the-middle: two md5-deterministic cuts 0 ≤ lo ≤ hi ≤ n over
    * the token array split the document into prefix/middle/suffix; the
    * PSM string moves the middle to the end behind sentinels. One
    * projection, no shuffle, no window — the 100 TB shape is "free"
    * (the transform rides whatever scan feeds it).
    *
    * Returns (idCol, n_tokens, n_prefix, n_middle, n_suffix, psm) where
    * psm = `<PRE> prefix <SUF> suffix <MID> middle` (single spaces; empty
    * sections collapse — concat_ws drops nothing because sentinels are
    * always present, sections may be '').
    */
  def fim(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "fim"): DataFrame = {
    val toks = Tokenize.tokenArray(col(textCol))
    val n = size(toks)
    val c1 = floor(u52(s"$salt:a", col(idCol)) * (n + 1).cast("double")).cast("int")
    val c2 = floor(u52(s"$salt:b", col(idCol)) * (n + 1).cast("double")).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    docs.select(
      col(idCol),
      n.cast("long").as("n_tokens"),
      lo.cast("long").as("n_prefix"),
      (hi - lo).cast("long").as("n_middle"),
      (n - hi).cast("long").as("n_suffix"),
      concat(
        lit("<PRE> "), array_join(slice(toks, lit(1), lo), " "),
        lit(" <SUF> "), array_join(slice(toks, hi + 1, n - hi), " "),
        lit(" <MID> "), array_join(slice(toks, lo + 1, hi - lo), " ")).as("psm"))
  }

  /** T5 span corruption: every token position draws one digest; a span
    * STARTS at position i with probability density/meanSpan and runs
    * 1..2·meanSpan−1 tokens (uniform — mean exactly meanSpan), so the
    * expected masked fraction ≈ density. Overlapping spans merge into
    * runs; run r of a document is sentineled `<X r>` in the input and
    * prefixes its tokens in the target — splicing the target's spans
    * back over the input's sentinels reconstructs the document exactly
    * (DenoiseSpec pins that inverse).
    *
    * Scale shape: the only non-map steps are one ≤(2·meanSpan−1)-way
    * coverage explode on span STARTS (density·n rows, not n), the
    * (doc, pos)-keyed mask dedup, and document-partitioned prefix sums
    * for run numbering — no global window, no cross join, state bounded
    * by one document everywhere.
    *
    * Returns (idCol, n_tokens, n_masked, n_runs, input_str, target_str).
    */
  def spanCorrupt(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      density: Double = 0.15,
      meanSpan: Int = 3,
      salt: String = "t5"): DataFrame = {
    require(density > 0 && density < 1, s"density ($density) must be in (0,1)")
    require(meanSpan >= 1 && meanSpan <= 16, s"meanSpan ($meanSpan) must be in [1,16]")
    // pinned 6-dp decimal, NOT density/meanSpan directly: the oracle mirrors
    // this threshold as a SQL literal, and a raw double quotient can land a
    // few ulps off the decimal literal (0.15/3 rounds ~7e-18 BELOW 0.05 —
    // provably equivalent for the shipped defaults only because no 52-bit
    // dyadic draw falls in that gap, an argument that would need re-checking
    // for every new (density, meanSpan)). Rounding both sides to the same
    // decimal makes the equivalence structural instead of accidental.
    val pStart = math.floor(density / meanSpan * 1e6 + 0.5) / 1e6
    val maxLen = 2 * meanSpan - 1
    val pos = docs
      .select(col(idCol).as("__d"),
        posexplode(Tokenize.tokenArray(col(textCol))).as(Seq("__p", "__w")))
    // one digest per (doc, pos): hex 1-13 -> start draw, hex 14-16 -> length
    val dg = md5(concat_ws(":", lit(salt), col("__d"), col("__p")))
    val drawn = pos
      .withColumn("__dg", dg)
      .withColumn("__start",
        graft.functions.HexSlice.u(col("__dg"), 1, 13).cast("double")
          / lit(4503599627370496.0) < lit(pStart))
      .withColumn("__len",
        (graft.functions.HexSlice.u(col("__dg"), 14, 3).cast("int") % maxLen) + 1)
    // coverage: each start emits its span's positions; merge by distinct
    val masked = drawn
      .where(col("__start"))
      .select(col("__d"),
        explode(sequence(col("__p"), col("__p") + col("__len") - 1)).as("__p"))
      .distinct()
      .withColumn("__m", lit(true))
    val flagged = drawn.select(col("__d"), col("__p"), col("__w"))
      .join(masked, Seq("__d", "__p"), "left_outer")
      .na.fill(false, Seq("__m"))
    val byPos = Window.partitionBy(col("__d")).orderBy(col("__p"))
    val runs = flagged
      .withColumn("__rs",
        (col("__m") && !coalesce(lag(col("__m"), 1).over(byPos), lit(false)))
          .cast("int"))
      .withColumn("__rid", sum(col("__rs")).over(byPos) - col("__rs"))
    // input piece: token when clean, one sentinel at each run start;
    // target piece: sentinel-prefixed first token of a run, tokens after
    val inPiece = when(!col("__m"), col("__w"))
      .when(col("__rs") === 1, concat(lit("<X"), col("__rid"), lit(">")))
    val tgPiece = when(col("__m") && col("__rs") === 1,
      concat(lit("<X"), col("__rid"), lit("> "), col("__w")))
      .when(col("__m"), col("__w"))
    runs
      .groupBy(col("__d").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__m").cast("long")).as("n_masked"),
        sum(col("__rs").cast("long")).as("n_runs"),
        array_join(transform(
          array_sort(collect_list(when(inPiece.isNotNull,
            struct(col("__p"), inPiece.as("s"))))),
          x => x.getField("s")), " ").as("input_str"),
        array_join(transform(
          array_sort(collect_list(when(tgPiece.isNotNull,
            struct(col("__p"), tgPiece.as("s"))))),
          x => x.getField("s")), " ").as("target_str"))
  }
}
