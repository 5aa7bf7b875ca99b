package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: every SparkEntry query + the flagship index build,
  * executed to completion through the noop sink (count() alone can let
  * Catalyst drop sorts/projections), one JSON line on stdout.
  *
  * Measurement hygiene (round-2 lesson): per-query numbers must measure the
  * PLAN, not the previous workload's garbage. Round 2 ran four ref-corpus
  * builds immediately before the alphabetical query sweep and the earliest
  * queries absorbed their GC/JIT shadow (q_agg_pricing 1.49 → 8.36 s with a
  * byte-identical optimal plan). Round 3 therefore:
  *   - runs the BASELINE.md ref-corpus build FIRST, on a quiet heap;
  *   - reuses one analyzed plan across the warm best-of-N runs (re-building
  *     the DataFrame re-lists 355 files and re-analyzes per run — overhead
  *     the reference binary does not pay between its timed runs either);
  *   - drops a System.gc() fence between workloads and between queries, so
  *     no timed region starts with the neighbor's garbage.
  */
object Bench {

  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Untimed GC fence: collect the previous workload's garbage so the next
    * timed region starts on a quiet heap. Two passes — the first unlinks,
    * the second collects what finalization released.
    */
  private def fence(): Unit = { System.gc(); System.gc() }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // getOrCreate() silently ignores withExtensions when any session is
    // already active — detach first so the measured session really carries
    // the engine's optimizer rule + sorted_set_agg (same pattern as
    // ExtensionsSpec).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the ref corpus is 355 individual paths: above the default
      // parallelPartitionDiscovery threshold (32) Spark launches a listing
      // JOB with one task per path — pure scheduling overhead for small
      // path sets; list driver-side instead
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // every timing sample behind each best-of-N number, persisted in the
    // artifact (r13 verdict task 2): a shipped "best" with its spread
    // makes load-noise adjudication possible from the artifact alone —
    // min ≈ steady state, median−min = the load/JIT shadow of that run
    val samples = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def record(name: String, s: Seq[Double]): Unit =
      samples(name) = samples.getOrElse(name, Seq.empty) ++ s

    /** Release the previous query's checkpoint/persist blocks, then fence.
      *
      * Round-9 closure of the r8 drift flag (isolated 3-run, local[32],
      * sf0.1, this cleanup active): q_pagerank 7.99/4.46/2.99,
      * q_ppr_seeds 21.98/5.24/4.16, q_multimodal_frames 3.54/2.47/2.37,
      * q_multimodal_audio_ds 2.36/2.05/2.35, q_quality_buckets
      * 2.58/1.44/1.26. Steady-state ppr (4.16) and pagerank are back at
      * or below their r7 sweep numbers — the r8 regression WAS the
      * checkpoint-block accumulation this hook removes. The multimodal
      * transforms' isolated steady state matches their sweep numbers
      * (~2.0-2.4 s), so their r7→r8 step was not sweep pollution; plans
      * are unchanged (EXPLAIN audit) and the residual is codec-path JIT
      * profile, not a plan regression.
      *
      * Eagerly `localCheckpoint(true)`ed relations (pagerank / ppr / kmeans
      * / bpe each pin several per run) stay registered in the block manager
      * until the ContextCleaner notices the dead reference — asynchronous
      * and GC-driven, so across a 150+-entry single-JVM sweep the blocks
      * pile up and raise heap pressure for everything after them (round-8
      * drift: five queries in untouched files regressed 28-51%). Every
      * sweep query rebuilds its DataFrames from scratch inside the timer,
      * so dropping ALL persistent RDDs between samples is safe here; this
      * is NOT called around the ref-corpus warm loop, whose analyzed plan
      * is deliberately reused across runs.
      */
    def clearRddStorage(): Unit = {
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case scala.util.control.NonFatal(_) => () }
      fence()
    }

    /** Time `body`; -1 on failure. A crash in any one workload must not
      * cost the harness the whole JSON line.
      */
    def timed(name: String)(body: => Unit): Unit = {
      var failed = false
      val elapsed = time { try body catch { case _: Throwable => failed = true } }
      results(name) = if (failed) -1.0 else elapsed
      if (!failed) record(name, Seq(elapsed))
    }

    /** Best-of-2 per query, with an adaptive THIRD run when the first two
      * disagree by more than 1.5×.
      *
      * Why best-of-N at all (round 4): q_pack_contents measured 6.98 s vs
      * round 3's 1.23 s on byte-identical code — first execution of a
      * window-heavy plan pays whole-stage-codegen JIT compilation
      * (measured 5.63 → 2.07 → 1.69 → 1.30 → 1.20 → 1.05 s over six
      * back-to-back runs), so a single sample sometimes lands on the
      * compile.
      *
      * Why the adaptive third run (round 7): round 6 recorded
      * q_simhash_pairs at 4.94 s best-of-2 vs round 5's 2.37 s on
      * byte-identical code. Re-measured in isolation this round: 7.31 s
      * cold, then 2.93/2.50/2.48/2.42/2.28 — the plan is unchanged and
      * steady-state is ~2.4 s; the r6 number means BOTH samples landed
      * hot (JIT + concurrent harness load). The same external load
      * explains index_build_ref_corpus_cold's 5.95 → 15.0 s (isolated
      * re-measure: 6.3 s; a cold run is a single unrepeatable sample, so
      * it carries whatever the machine is doing). When two samples
      * disagree by >1.5× at least one of them is not steady-state — one
      * more fenced run resolves it; when they agree, the third run's cost
      * is skipped for the ~90-query sweep.
      */
    def timedBest2(name: String)(body: => Unit): Unit = {
      var failed  = false
      val first   = time { try body catch { case _: Throwable => failed = true } }
      if (failed) { results(name) = -1.0; return }
      clearRddStorage()
      val second  = time { try body catch { case _: Throwable => failed = true } }
      if (failed) { results(name) = -1.0; return }
      val best2 = math.min(first, second)
      if (math.max(first, second) <= best2 * 1.5) {
        results(name) = best2; record(name, Seq(first, second)); return
      }
      clearRddStorage()
      val third = time { try body catch { case _: Throwable => failed = true } }
      results(name) = if (failed) -1.0 else math.min(best2, third)
      if (!failed) record(name, Seq(first, second, third))
    }

    // warm the JVM + parquet footers once so per-query numbers measure the
    // plan, not first-touch class loading
    try run(spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1))
    catch { case _: Throwable => () }

    // ISOLATED adjudication mode (the min-of-5 protocol the sweep flags
    // get adjudicated by, previously run via scratch drivers): named
    // queries only, five fenced samples each, one JSON line per query,
    // and NO artifact write — BENCH_FULL stays the sweep's.
    if (args.nonEmpty) {
      args.foreach { name =>
        if (name == "index_build_ref_corpus") {
          // the headline BASELINE.md workload is not a queries entry —
          // adjudicate it with the sweep's own discipline: one unrecorded
          // warm run (plan analysis + codegen), then min over five fenced
          // re-executions of the analyzed plan
          val refPlan = Engine.indexFromManifest(
            spark, "/root/reference/checker/test.txt", "/root/reference/checker")
          run(refPlan)
          val ss = (1 to 5).map { _ => clearRddStorage(); time(run(refPlan)) }
          def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
          println(s"""{"query":"$name","min":${fm(ss.min)},"samples":[${ss.map(fm).mkString(",")}]}""")
        } else
        SparkEntry.queries.get(name) match {
          case None => println(s"""{"query":"$name","err":"unknown"}""")
          case Some(fn) =>
            // a sample that throws must NOT adjudicate as a fast min: a
            // query broken on every run times the throw path (near zero)
            // and would silently adjudicate a regression flag as a huge
            // speedup. Track success PER SAMPLE — one transient failure
            // (GC-pause executor loss, OOM-kill recovery) must not discard
            // four good timings; min is over the successful samples, the
            // failure count and last error ride along, and -1 is reported
            // only when EVERY sample threw (matching the sweep convention)
            var lastErr: String = null
            var errN = 0
            val ss = (1 to 5).flatMap { _ =>
              clearRddStorage()
              var ok = true
              val t = time(try run(fn(spark, sfDir)) catch {
                case t: Throwable =>
                  ok = false; errN += 1; lastErr = t.getClass.getSimpleName
              })
              if (ok) Some(t) else None
            }
            def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
            if (ss.isEmpty)
              println(s"""{"query":"$name","min":-1,"err":"$lastErr","err_count":$errN,"sf":"$sfDir"}""")
            else {
              val errPart = if (errN > 0) s""","err_count":$errN,"err":"$lastErr"""" else ""
              println(s"""{"query":"$name","min":${fm(ss.min)},"samples":[${ss.map(fm).mkString(",")}]$errPart,"sf":"$sfDir"}""")
            }
        }
      }
      spark.stop()
      return
    }

    // the BASELINE.md workload itself, FIRST, on a quiet heap: the
    // reference's large corpus (355 docs, ~1.04M tokens; reference
    // sequential wall time 2.47 s). The cold run pays file listing, plan
    // analysis and codegen compilation; the warm number is the
    // throughput-comparable one (the reference binary's 2.47 s is also
    // steady-state CPU work, not process startup). Warm runs re-execute ONE
    // analyzed plan — the listing/analysis is corpus metadata, not indexing
    // work, and re-paying it per run measured the planner, not the engine.
    val refManifest = "/root/reference/checker/test.txt"
    if (new java.io.File(refManifest).exists()) {
      timed("index_build_ref_corpus_cold") {
        run(Engine.indexFromManifest(spark, refManifest, "/root/reference/checker"))
      }
      val refPlan = Engine.indexFromManifest(spark, refManifest, "/root/reference/checker")
      // best-of-5 warm: single warm samples proved unstable under harness
      // load in rounds 1-2 (warm measured SLOWER than cold); min over five
      // runs is the steady-state throughput number BASELINE.md compares to
      val warms = (1 to 5).map { _ =>
        fence()
        time(try run(refPlan) catch { case _: Throwable => () })
      }
      results("index_build_ref_corpus") = warms.min
      record("index_build_ref_corpus", warms)
    }

    fence()

    // flagship: full inverted-index build over the sf documents table.
    // best-of-2-adaptive-3 like every sweep query (r12 flagged this entry
    // doubling round-over-round on unchanged code — a single sample right
    // after the ref-corpus workload carries whatever JIT/load shadow is
    // around; the min-of-N discipline the rest of the sweep already has
    // is the fix). The ref-corpus warm entry above is already min-of-5;
    // the cold entry is inherently a single unrepeatable sample (one true
    // cold run exists per JVM) and stays one — read it as "startup +
    // first-touch", not steady-state throughput.
    timedBest2("index_build") {
      run(
        operators.InvertedIndex.rankedGlobal(
          operators.InvertedIndex.postings(
            operators.Tokenize.tokens(
              spark.read.parquet(s"$sfDir/documents.parquet"), "text", Seq("doc_id")))))
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      clearRddStorage()
      // build + execute inside the timer both times: several queries (the
      // dedup-groups family) run their iterative actions during DataFrame
      // CONSTRUCTION, so timing a pre-built df would skip the real work
      timedBest2(name)(run(fn(spark, sfDir)))
    }

    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Failures must be loud (round-10 lesson: 18 queries recorded -1.0 yet
    // the sweep exited 0, so the rc masked an entire broken query family):
    // the JSON carries an explicit failed count + names, and the process
    // exits nonzero below when any query failed.
    val failedNames = results.collect { case (k, v) if v < 0 => k }.toSeq
    val failedJson =
      s""","failed":${failedNames.size},"failed_queries":[${failedNames.map("\"" + _ + "\"").mkString(",")}]"""
    // per-query raw samples ride the artifact so min/median/spread are
    // recoverable without re-running; a loaded sweep is then self-evident
    // (large spread) instead of needing a quiet re-run to adjudicate
    val samplesJson = samples.map { case (k, vs) =>
      "\"" + k + "\":[" + vs.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // ship-time variance guard (r15 verdict task 7): twice (r12 outliers,
    // r15 q_multimodal_frames) a loaded sample forced the NEXT round's judge
    // to adjudicate a regression the sweep itself could have flagged. Read
    // the prior round's artifact BEFORE overwriting it and list every query
    // whose new best exceeds 1.5× its prior best (with a 0.3 s absolute
    // floor so millisecond queries don't flag on scheduler noise) — the
    // artifact then names what needs adjudication at ship time.
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val priorBest: Map[String, Double] = try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(priorPath)), "UTF-8")
      val start = txt.indexOf("\"queries\":{")
      if (start < 0) Map.empty
      else {
        val body = txt.substring(start + 11, txt.indexOf('}', start))
        "\"([^\"]+)\":(-?[0-9.]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val regressions = results.toSeq.collect {
      case (k, v) if v >= 0 && priorBest.get(k).exists(p =>
        p >= 0 && v > p * 1.5 && v - p > 0.3) =>
        s"""{"query":"$k","prior":${fmt(priorBest(k))},"now":${fmt(v)}}"""
    }
    // a disabled guard must be visible: if the prior artifact EXISTS but the
    // hand parse yielded nothing (format drift, nested values), say so in
    // the artifact instead of shipping an indistinguishable-from-clean []
    val priorUnreadable =
      priorBest.isEmpty && java.nio.file.Files.exists(java.nio.file.Paths.get(priorPath))
    val regressionsJson =
      if (priorUnreadable) ""","regressions":[{"prior_unreadable":true}]"""
      else s""","regressions":[${regressions.mkString(",")}]"""
    // Self-computing cross-round drift audit (r17 verdict task 1: the
    // hand-computed SURVEY median didn't reproduce — 1.04 claimed, 1.135
    // measured from the artifacts). The sweep now emits the number itself:
    // median per-query ratio new-best / prior-best over the common q_*
    // entries (flagship index-build entries excluded — the cold run is a
    // single unrepeatable sample), plus the common-query count, so the
    // narrative cites the artifact instead of prose arithmetic.
    val ratios = results.toSeq.collect {
      case (k, v) if k.startsWith("q_") && v > 0 &&
        priorBest.get(k).exists(_ > 0) => v / priorBest(k)
    }.sorted
    val driftJson =
      if (priorUnreadable || ratios.isEmpty) ""","drift_vs_prior":null"""
      else {
        val n = ratios.size
        val med = if (n % 2 == 1) ratios(n / 2) else (ratios(n / 2 - 1) + ratios(n / 2)) / 2
        s""","drift_vs_prior":{"median_ratio":${fmt(med)},"common_queries":$n}"""
      }
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$failedJson$regressionsJson$driftJson,"samples":$samplesJson,"sf":"$sfDir"}"""
    println(full)
    // The driver's stdout-tail capture truncates the front of long lines
    // (rounds 3-4 lost the first ~45 queries of the map), so the complete
    // per-query map also lands in a FILE artifact — round-over-round
    // regressions stay diffable without scraping stdout.
    // NonFatal only, and LOUD: a silently-failed write leaves a stale
    // artifact from a previous round misreporting the current sweep — the
    // artifact exists precisely because stdout was unreliable
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (full + "\n").getBytes("UTF-8"))
    } catch {
      case scala.util.control.NonFatal(e) =>
        Console.err.println(s"WARN: BENCH_FULL write failed (stale artifact possible): $e")
    }
    // The full line above is ~3 KB and the driver's stdout-tail capture has
    // truncated its FRONT in rounds 3-4 ("parsed": null). Print a short
    // final line — total + flagship numbers only — so the parse target
    // always fits inside the tail window.
    val flagship = Seq("index_build_ref_corpus", "index_build_ref_corpus_cold", "index_build")
      .filter(results.contains)
      .map(k => "\"" + k + "\":" + fmt(results(k)))
      .mkString(",")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{$flagship},"failed":${failedNames.size},"sf":"$sfDir"}""")
    spark.stop()
    // nonzero rc when any query failed — AFTER both JSON lines and the file
    // artifact are safely out, so the evidence of WHAT failed is never lost
    if (failedNames.nonEmpty) sys.exit(1)
  }
}
