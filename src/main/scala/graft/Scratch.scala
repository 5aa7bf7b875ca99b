package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(body: => Unit): Unit = {
      System.gc(); System.gc()
      val t0 = System.nanoTime()
      body
      println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    for (_ <- 1 to 2) {
      var occ: DataFrame = null
      var draws: DataFrame = null
      var idx: DataFrame = null
      val nonEmpty = operators.Dedup.wNonEmpty(d, "doc_id", "text")
      time("wOcc ckpt") { occ = operators.Dedup.wOcc(nonEmpty, "doc_id", "text", 3) }
      println("[scratch] occ parts=" + occ.rdd.getNumPartitions + " rows=" + occ.count())
      time("wDraws ckpt") { draws = operators.Dedup.wDraws(occ, nonEmpty, 16) }
      println("[scratch] draws rows=" + draws.count())
      time("sh sorted-set agg")(run(occ.groupBy(col("doc_id")).agg(sort_array(collect_set(col("__s"))).as("sh"))))
      time("wBandKeys")(run(operators.Dedup.wBandKeys(occ, draws, "doc_id", 16, 8)))
      time("full wminhashIndex") {
        idx = operators.Dedup.wminhashIndex(d, "doc_id", "text", 3, 16, 8).index
      }
      time("candidatesFromIndex tail")(run(operators.Dedup.candidatesFromIndex(idx, maxBucket = 4096)))
    }
    spark.stop()
  }
}
