package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt` — the per-query before/after plan evidence
  * the optimization rounds commit under plans/r{N}/.
  *
  * Usage: `runMain graft.PlanDump <outDir> <tag> <sfDir> q_a q_b ...`
  *
  * Same session surface as Bench (extensions, AQE, shuffle partitions =
  * SPARK_GRAFT_CPUS) so the dumped initial plan is the one the bench runs.
  * Iterative queries (the dedup-groups family) execute their loop during
  * DataFrame construction; their dumped plan is the final served relation,
  * matching the EXPLAIN_r{N} convention.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag    = args(1)
    val sfDir  = args(2)
    val names  = args.drop(3)
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
              (s"== $name ($tag, sf=$sfDir) ==\n" + txt).getBytes("UTF-8"))
            println(s"[plandump] wrote $outDir/${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
