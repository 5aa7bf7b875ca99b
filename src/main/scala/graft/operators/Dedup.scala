package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines.
  *
  * Scale design notes (100 TB):
  *  - exact dedup groups on a 256-bit content hash, never the raw text —
  *    the shuffle moves 32-byte keys instead of documents.
  *  - MinHash-LSH shuffles only (band_key, doc_id) pairs; candidate
  *    verification happens per-bucket, so no all-pairs comparison exists
  *    anywhere in the plan.
  *  - All hashing is md5-hex based: deterministic, engine-portable (the
  *    DuckDB oracle computes the identical signature), and uniform enough
  *    for banding.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content with the lowest
    * doc_id as the keeper. Groups by sha2(text) so the shuffle key is 32
    * bytes regardless of document size.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")

  /** MinHash signature entries: one md5-hex minimum per seed, computed
    * entirely map-side over a MATERIALIZED shingle-array column (no explode,
    * no shuffle; see TextAnalysis.shinglesFromToks for why the column must
    * be bound, not inlined).
    * Portable: signature_i = min over shingles of md5(i || ':' || shingle).
    */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(sh, s => md5(concat(lit(s"$seed:"), s))))
    }: _*)

  /** LSH band keys: the signature split into `bands` groups of
    * `rows = numHashes / bands` hashes, each band collapsed to one md5 key
    * prefixed with its band index.
    */
  def bandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      concat(lit(s"$b|"), md5(concat_ws("", (0 until rows).map(r => signature.getItem(b * rows + r)): _*)))
    }: _*)

  /** MinHash-LSH candidate duplicate pairs (doc1 < doc2): docs sharing at
    * least one band key. The only shuffle is the self-join on band_key.
    */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleK: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) — otherwise trailing hashes are silently unused")
    val rows = numHashes / bands
    // explode_outer: band-key arrays are never empty, and plain explode
    // triggers InferFiltersFromGenerate, which would re-evaluate the whole
    // signature expression inside a pushed-down size()>0 scan filter.
    // Token-less docs have an empty shingle set and no meaningful signature —
    // banding them would match them all against each other. Filter on TOKEN
    // emptiness (equivalent: shingles are empty iff tokens are), NOT on
    // size(__sh): a predicate on the shingle column gets pushed below the
    // projection and re-inlines the whole quadratic shingle expression into
    // the scan filter (measured 3x on q_dedup_minhash); the token array is a
    // single pass and safe to push.
    val nonEmpty = docs
      .select(col(idCol), col(textCol))
      .where(size(Tokenize.tokenArray(col(textCol))) > 0)
    val banded = TextAnalysis
      .withShingles(nonEmpty, textCol, shingleK, "__sh")
      .withColumn("__sig", minhashSignatureFromShingles(col("__sh"), numHashes))
      .select(col(idCol), explode_outer(bandKeys(col("__sig"), bands, rows)).as("band_key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band_key") === col("b.band_key") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc1"), col(s"b.$idCol").as("doc2"))
      .distinct()
  }

  /** 32-bit SimHash from token frequencies. Per distinct word: a 60-bit
    * md5-derived hash; bit j contributes +freq if set else -freq; signature
    * bit j is 1 iff the sum is positive. Fully expressible in ANSI SQL.
    */
  def simhash(tokens: DataFrame, idCol: String = "doc_id"): DataFrame =
    tokens
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("freq"))
      // 60-bit portable word hash: first 15 hex chars of md5, base-16 → long
      .withColumn("h", conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
      // `>>` with a column shift amount: expr() — the Scala DSL's shiftright
      // only takes a literal Int
      .select(col(idCol), col("freq"), col("h"), explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("contrib", when(expr("shiftright(h, bit) % 2") === 1, col("freq")).otherwise(-col("freq")))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("contrib")).as("bitsum"))
      .withColumn("bitval", when(col("bitsum") > 0, expr("cast(pow(2, bit) as bigint)")).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("bitval")).as("simhash"))
}
