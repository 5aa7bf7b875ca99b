package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.int8Quantize]]: codes bounded, reconstruction bounded by
  * half a quantization step, zero vectors safe, int8 dot exactness.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("codes lie in [-127, 127] and reconstruction error ≤ scale/2 per component") {
    val q = Similarity.int8Quantize(emb)
    val bad = q.where(exists(col("codes"), c => abs(c) > 127)).count()
    assert(bad == 0, "codes must fit int8")
    // max per-component |x - c*s| over all vectors ≤ s/2 (+ double slack)
    val viol = q.join(emb, Seq("vec_id"))
      .where(exists(
        zip_with(col("embedding"), col("codes"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("scale_r"))),
        e => e > col("scale_r") * 0.5 + lit(1e-6)))
      .count()
    assert(viol == 0, "reconstruction must stay within half a step")
  }

  test("all-zero vector quantizes to scale 0, zero codes, zero error") {
    val z = Seq((99999L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.int8Quantize(z).collect().head
    assert(r.getDouble(1) == 0.0)
    assert(r.getSeq[Int](2).forall(_ == 0))
    assert(r.getDouble(3) == 0.0)
  }

  test("int8 dot product is integer-exact: sum(c1*c2)*s1*s2 approximates the float dot") {
    val q = Similarity.int8Quantize(emb).where(col("vec_id") < 20)
      .join(emb.where(col("vec_id") < 20), Seq("vec_id"))
    val pairs = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        (aggregate(zip_with(col("a.codes"), col("b.codes"),
          (x, y) => (x * y).cast("long")), lit(0L), (acc, e) => acc + e)
          .cast("double") * col("a.scale_r") * col("b.scale_r")).as("qdot"),
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("fdot"))
    val maxErr = pairs.agg(max(abs(col("qdot") - col("fdot")))).head.getDouble(0)
    assert(maxErr < 0.05, s"int8 dot diverged from float dot by $maxErr")
  }

  test("randomProject approximately preserves pairwise distances (JL property)") {
    val sub = emb.where(col("vec_id") < 30)
    val proj = Similarity.randomProject(sub, m = 8)
    val pcols = (0 until 8).map(j => col(s"p$j"))
    val projArr = proj.select(col("vec_id"), array(pcols: _*).as("pv"))
    val orig = sub.select(col("vec_id"), col("embedding"))
    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))), lit(0.0), (s, e) => s + e)
    val joined = orig.as("a").join(orig.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        d2(col("a.embedding"), col("b.embedding")).as("od2"))
      .join(projArr.as("pa"), col("i") === col("pa.vec_id"))
      .join(projArr.as("pb"), col("j") === col("pb.vec_id"))
      .select(col("od2"), d2(col("pa.pv"), col("pb.pv")).as("pd2"))
      .where(col("od2") > 1e-9)
      .withColumn("ratio", col("pd2") / col("od2"))
    val stats = joined.agg(
      avg(col("ratio")).as("mean"), min(col("ratio")).as("lo"), max(col("ratio")).as("hi"))
      .head()
    // m=8 is coarse: the MEAN ratio should sit near 1 (unbiased estimator),
    // individual pairs spread but stay within loose multiplicative bounds
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.35, s"mean distortion ${stats.getDouble(0)}")
    assert(stats.getDouble(1) > 0.02 && stats.getDouble(2) < 6.0,
      s"pairwise distortion out of loose JL bounds: ${stats}")
  }
}
