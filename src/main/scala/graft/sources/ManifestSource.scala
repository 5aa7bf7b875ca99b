package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest + corpus sources (reference O1/O2, src/main.cpp:49-83,107-117).
  *
  * Manifest format: first line = number of documents N, then N paths, one per
  * line; LINE POSITION DEFINES THE DOCUMENT ID (1-based in all outputs —
  * reference assigns 0-based internally and adds 1 at the sink,
  * src/main.cpp:312; we carry the 1-based id end-to-end).
  *
  * Scale design: the manifest itself is tiny relative to the corpus (one line
  * per file — even 100M files fit in driver memory, the same regime as Spark's
  * own file-listing). Document contents are read DISTRIBUTED via
  * `spark.read.textFile` over all paths at once, then joined back to the
  * manifest ids by file path with a broadcast join — no per-file driver loop.
  */
object ManifestSource {

  /** Read a manifest into (file_id, path) with stable positional 1-based ids.
    * RDD `zipWithIndex` over `textFile` preserves line order (partitions are
    * ordered by file offset), which is the one invariant DataFrames alone
    * can't promise (SURVEY §1 invariant 1).
    *
    * Reference fidelity — the manifest is a WHITESPACE-TOKEN stream, exactly
    * like the reference's fscanf("%s") loop (src/main.cpp:59-80): the first
    * token is the declared count N, the next N tokens are the paths; blank
    * lines never consume a document id, a count sharing a line with the
    * first path is legal, and trailing junk after the N-th path is ignored.
    * (Consequence inherited from the format itself: paths cannot contain
    * whitespace — fscanf could never read one.)
    */
  def docRefs(spark: SparkSession, manifestPath: String, baseDir: String): DataFrame = {
    import spark.implicits._
    val tokens = spark.sparkContext
      .textFile(manifestPath)
      .flatMap(_.split("\\s+"))
      .filter(_.nonEmpty)
      .zipWithIndex()
    val declared = tokens.filter(_._2 == 0L).map(_._1).collect().headOption
      .map(_.toLong)
      .getOrElse(0L)
    tokens
      .filter { case (_, idx) => idx >= 1 && idx <= declared }
      .map { case (rel, idx) => (idx, rel) }
      .toDF("file_id", "rel_path")
      .withColumn("path", concat(lit(baseDir.stripSuffix("/") + "/"), col("rel_path")))
  }

  /** Distributed read of every manifest document: one row per text line,
    * (file_id, line). The join key is the absolute path recovered from
    * `input_file_name()` (a file: URI); the manifest side is broadcast.
    *
    * COMPARISON BASELINE ONLY — not a production path: the
    * `refs.collect()` below pulls every manifest path to the driver, which
    * a 100 TB manifest (millions of paths) cannot afford. All production
    * callers ([[graft.Engine.indexFromManifest]], Main) read through the
    * `graft-manifest` DSv2 source instead, whose ids travel with the scan
    * partitions; this assembly survives solely as the independent
    * implementation ManifestV2Spec pins V2 equal to.
    */
  def docLines(spark: SparkSession, refs: DataFrame): DataFrame = {
    val paths = refs.select("path").collect().map(_.getString(0))
    if (paths.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("file_id", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("line", org.apache.spark.sql.types.StringType))))
    } else {
      val lines = spark.read
        .textFile(paths: _*)
        .select(
          // input_file_name() is a percent-encoded file: URI. Normalize to a
          // plain path: strip the scheme, protect literal '+' (url_decode is
          // form-decoding and would turn it into a space), then %XX-decode —
          // otherwise files with spaces/special chars silently drop out of
          // the broadcast join.
          expr("""url_decode(regexp_replace(regexp_replace(input_file_name(), '^file:/+', '/'), '\\+', '%2B'))""")
            .as("path"),
          col("value").as("line"))
      lines
        .join(broadcast(refs.select("file_id", "path")), Seq("path"))
        .select("file_id", "line")
    }
  }
}
