import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch isolated-run tool (round 11): adjudicate the round-10 sweep
  * drift. Eight queries in UNTOUCHED files regressed 28-83% in the r10
  * sweep (q_pagerank 4.79->8.77 etc.); this times each isolated on a quiet
  * JVM, 4 fenced runs, so steady-state is separable from harness load.
  * Also probes the leak hypothesis: does the sweep's release hook
  * (unpersist all persistent RDDs) actually see minhashIndex's
  * localCheckpoint(true) blocks?
  *
  * VERDICT (measured 2026-08-13, local[32], sf0.1, cold/3 warm):
  *   q_pagerank        10.71 / 4.15 / 3.55 / 3.05   (r9 sweep 4.79, r10 8.77)
  *   q_ppr_seeds        6.37 / 3.88 / 3.32 / 3.27   (r9 3.29, r10 4.87)
  *   q_assoc_rules      3.17 / 2.41 / 1.81 / 1.58   (r9 1.53, r10 2.94)
  *   q_containment_dup  0.77 / 0.55 / 0.44 / 0.57   (r9 0.52, r10 1.80)
  *   q_cross_dedup      4.18 / 3.03 / 3.02 / 3.00   (r9 3.81, r10 4.98)
  *   q_setsim_join      7.82 / 6.41 / 6.22 / 6.53   (r9 6.62, r10 7.67)
  *   q_jaro_linkage     0.52 / 0.28 / 0.29 / 0.31   (r9 0.34, r10 1.27)
  *   q_corpus_diff      0.48 / 0.36 / 0.33 / 0.30   (r9 0.32, r10 1.31)
  * Every isolated steady-state is AT or BELOW its r9 sweep number: the r10
  * regressions were harness load, not plan or hygiene regressions. The leak
  * probe printed before=0 afterIndex=1 afterRelease=0 — the sweep's release
  * hook DOES see and free the minhashIndex localCheckpoint blocks, so the
  * round-8 accumulation mechanism is NOT back.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def release(): Unit = {
      try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      catch { case scala.util.control.NonFatal(_) => () }
      System.gc(); System.gc()
    }
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time4(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        release()
        val t0 = System.nanoTime(); run(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"DRIVE $name%-24s ${ts.map(t => f"$t%.2f").mkString(" / ")}")
    }

    // leak probe: after building the checkpointed signature index, is it
    // visible to the release hook?
    val before = spark.sparkContext.getPersistentRDDs.size
    graft.operators.Dedup.minhashIndex(spark.read.parquet(s"$dir/documents.parquet")).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    release()
    val released = spark.sparkContext.getPersistentRDDs.size
    println(s"DRIVE persistentRDDs before=$before afterIndex=$after afterRelease=$released")

    Seq("q_pagerank", "q_ppr_seeds", "q_assoc_rules", "q_containment_dup",
        "q_cross_dedup", "q_setsim_join", "q_jaro_linkage", "q_corpus_diff")
      .foreach { q => time4(q)(graft.SparkEntry.queries(q)(spark, dir)) }
    spark.stop()
  }
}
