package graft

import org.apache.spark.sql.functions._

import graft.plans.{Bucketing, Salting}

class PlansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join without a shuffle exchange") {
    val orders   = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    // the in-memory catalog forgets tables between JVMs but their warehouse
    // directories survive — clear both or saveAsTable throws
    // LOCATION_ALREADY_EXISTS on re-runs
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Bucketing.writeBucketed(orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", "custkey", 4)
    Bucketing.writeBucketed(customer.withColumnRenamed("c_custkey", "custkey"), "customer_b", "custkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "custkey")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no hashpartitioning exchange:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      val n = joined.count()
      val want = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .count()
      assert(n == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted count equals plain count on a skewed key") {
    val events = graft.sources.EventsSource.events(spark, dir)
    // event_type is low-cardinality (hot keys by construction)
    val salted = Salting
      .saltedCount(events, "event_type", "event_id", salts = 8)
      .orderBy("event_type")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val plain = events
      .groupBy("event_type")
      .count()
      .orderBy("event_type")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(salted.nonEmpty && salted.toSeq == plain.toSeq)
  }

  test("saltPlan: only keys over target surface, factors bring per-task rows under target") {
    import spark.implicits._
    val df = (Seq.fill(2500)("hot") ++ Seq.fill(500)("ok")).toDF("k")
    val got = Salting.saltPlan(df, "k", targetRows = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("hot", 2500L, 3L, 834L)), s"got ${got.toSeq}")
    assert(got.forall(t => t._4 <= 1000L), "recommended factor must land under target")
  }

  test("salted join equals plain join") {
    val li   = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_linenumber", "l_quantity")
    val o    = spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = Salting
      .saltedJoin(li, o, "l_orderkey", "l_linenumber", salts = 4)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .orderBy("o_orderstatus")
      .collect()
    val plain = li
      .join(o, Seq("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .orderBy("o_orderstatus")
      .collect()
    assert(salted.nonEmpty && salted.toSeq == plain.toSeq)
  }
}
