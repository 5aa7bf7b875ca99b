import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

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
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def release(): Unit = {
      try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      catch { case scala.util.control.NonFatal(_) => () }
      System.gc(); System.gc()
    }
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time3(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        release()
        val t0 = System.nanoTime(); run(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"DRIVE $name%-28s ${ts.map(t => f"$t%.2f").mkString(" / ")}")
    }
    time3("est_semijoin") { Dedup.minhashEstimateVsExact(docs).orderBy("doc1", "doc2") }
    time3("end2end_indexed") { graft.SparkEntry.queries("q_dedup_end2end")(spark, dir).orderBy("doc_id") }
    spark.stop()
  }
}
