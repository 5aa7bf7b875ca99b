import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch isolated-run tool (round 11): adjudicate the round-10 sweep
  * drift. Eight queries in UNTOUCHED files regressed 28-83% in the r10
  * sweep (q_pagerank 4.79->8.77 etc.); this times each isolated on a quiet
  * JVM, 4 fenced runs, so steady-state is separable from harness load.
  * Also probes the leak hypothesis: does the sweep's release hook
  * (unpersist all persistent RDDs) actually see minhashIndex's
  * localCheckpoint(true) blocks?
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
