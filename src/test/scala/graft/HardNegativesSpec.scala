package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.hardNegatives]]: the dup band is excluded, and within
  * the admitted band the ranking is exactly the brute-force top-k.
  */
class HardNegativesSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("no returned negative sits inside the dup band; ranking matches filtered brute force") {
    val maxCos = 0.6
    val queries = emb.where(col("vec_id") < 10)
    val got = Similarity.hardNegatives(emb, queries, k = 5, maxCos = maxCos)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty && got.forall(_._4 <= maxCos), "dup-band vector leaked into negatives")
    // brute-force mirror: full top-k over the SAME filtered pair set
    val e = emb.select(col("vec_id"), col("embedding").as("ev"))
      .withColumn("en", Similarity.norm("ev"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .withColumn("qn", Similarity.norm("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(desc("cos6"), asc("vec_id"))
    val want = e.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("cos", Similarity.dot(col("qv"), col("ev")) / (col("qn") * col("en")))
      .where(col("cos") <= maxCos)
      .withColumn("cos6", graft.functions.Portable.pround(col("cos"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"), col("rank"),
        graft.functions.Portable.pround(col("cos"), 4).as("cos_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSet == want.toSet)
  }
}
