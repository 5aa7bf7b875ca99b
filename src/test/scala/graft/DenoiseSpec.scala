package graft

import org.apache.spark.sql.functions._

import graft.operators.{Denoise, Tokenize}

/** Denoising transforms: FIM section reassembly + cut replay, and span
  * corruption's INVERSE — splicing the target's spans over the input's
  * sentinels must reconstruct the document exactly. Plus the masked-
  * fraction envelope and determinism.
  */
class DenoiseSpec extends SparkSpec {
  import spark.implicits._

  private val sfDocs = "/root/testdata/sf0.001/documents.parquet"

  test("fim: sections reassemble to the original tokens; cuts replay the md5 draws") {
    val docs = spark.read.parquet(sfDocs).select("doc_id", "text")
    val toksOf = docs
      .select(col("doc_id"), Tokenize.tokenArray(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rows = Denoise.fim(docs).collect()
    assert(rows.length == toksOf.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(s: String): Double = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = toksOf(id)
      val n = t.size
      val (np, nm, ns) =
        (r.getAs[Long]("n_prefix").toInt, r.getAs[Long]("n_middle").toInt,
          r.getAs[Long]("n_suffix").toInt)
      assert(r.getAs[Long]("n_tokens") == n && np + nm + ns == n, s"doc $id lengths")
      // exact cut replay
      val c1 = math.floor(u(s"fim:a:$id") * (n + 1)).toInt
      val c2 = math.floor(u(s"fim:b:$id") * (n + 1)).toInt
      assert(np == math.min(c1, c2) && np + nm == math.max(c1, c2), s"doc $id cuts")
      // PSM parse + reassembly
      val psm = r.getAs[String]("psm")
      val pre = psm.indexOf("<PRE> ") + 6
      val suf = psm.indexOf(" <SUF> ")
      val mid = psm.indexOf(" <MID> ")
      val prefix = psm.substring(pre, suf)
      val suffix = psm.substring(suf + 7, mid)
      val middle = psm.substring(mid + 7)
      val rebuilt = Seq(prefix, middle, suffix).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == t.mkString(" "), s"doc $id reassembly")
    }
  }

  test("spanCorrupt: splicing target spans over input sentinels reconstructs every doc") {
    val docs = spark.read.parquet(sfDocs).select("doc_id", "text")
      .where(col("text").rlike("[A-Za-z]"))
    val toksOf = docs
      .select(col("doc_id"), Tokenize.tokenArray(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val out = Denoise.spanCorrupt(docs).collect()
    assert(out.length == toksOf.size)
    var totTokens = 0L
    var totMasked = 0L
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      totTokens += r.getAs[Long]("n_tokens")
      totMasked += r.getAs[Long]("n_masked")
      // parse target: "<Xk> tok tok <Xk+1> tok ..." -> spans by sentinel
      val tgt = r.getAs[String]("target_str")
      val spans = scala.collection.mutable.Map[String, Seq[String]]()
      var cur: String = null
      tgt.split(" ").filter(_.nonEmpty).foreach { w =>
        if (w.startsWith("<X")) { cur = w; spans(cur) = Seq.empty }
        else spans(cur) = spans(cur) :+ w
      }
      assert(spans.size == r.getAs[Long]("n_runs"), s"doc $id run count")
      val spliced = r.getAs[String]("input_str").split(" ").filter(_.nonEmpty)
        .flatMap(w => if (w.startsWith("<X")) spans(w) else Seq(w))
      assert(spliced.toSeq == toksOf(id), s"doc $id reconstruction")
    }
    // masked fraction ~ density = 0.15 over the whole corpus
    val frac = totMasked.toDouble / totTokens
    assert(frac > 0.10 && frac < 0.20, s"masked fraction $frac vs density 0.15")
  }

  test("both transforms are rerun-deterministic") {
    val docs = spark.read.parquet(sfDocs).select("doc_id", "text")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    assert(sig(Denoise.fim(docs)) == sig(Denoise.fim(docs)))
    assert(sig(Denoise.spanCorrupt(docs)) == sig(Denoise.spanCorrupt(docs)))
  }
}
