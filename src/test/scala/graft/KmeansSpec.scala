package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The full Lloyd training loop against an independent in-memory
  * implementation: same portable rounding (floor(x·1e6+0.5)/1e6 argmax
  * keys, 4-dp centroid quantization) and tie-breaks, iterated to the same
  * quantized fixpoint — so a bug in the assignment, the mean, the
  * convergence detection, or the loop plumbing diverges here.
  */
class KmeansSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  private val rnd = new java.util.Random(11)
  private val centers = Array.fill(4, dim)(rnd.nextGaussian().toFloat)
  private def near(c: Int): Array[Float] = centers(c).map(v => v + 0.15f * rnd.nextGaussian().toFloat)
  private lazy val pts: Seq[(Long, Array[Float])] = (0 until 120).map(i => (i.toLong, near(i % 4)))

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def dd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dd(a, b) / (math.sqrt(dd(a, a)) * math.sqrt(dd(b, b)))

  /** In-memory Lloyd with quantized centroids, run to the exact fixpoint. */
  private def lloydFixpoint(
      data: Seq[(Long, Array[Double])],
      init: Map[Long, Array[Double]],
      maxIters: Int): Map[Long, (Long, Seq[Long])] = {
    var cents = init
    var prevQ: Map[Long, Seq[Long]] = Map.empty
    var result: Map[Long, (Long, Seq[Long])] = Map.empty
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val assigned = data.groupBy { case (_, v) =>
        cents.toSeq.map { case (cid, cv) => (round6(cos(v, cv)), cid) }
          .sortBy { case (c6, cid) => (-c6, cid) }.head._2
      }
      result = assigned.map { case (cell, members) =>
        val mean = (0 until dim).map { p =>
          val avg = members.map(_._2(p)).sum / members.size
          math.floor(avg * 1e4 + 0.5) / 1e4
        }
        cell -> (members.size.toLong, mean.map(m => math.floor(m * 1e4 + 0.5).toLong))
      }
      cents = result.map { case (cell, (_, q)) => cell -> q.map(_ / 1e4).toArray }
      val curQ = result.map { case (cell, (_, q)) => cell -> q }
      done = curQ == prevQ
      prevQ = curQ
      it += 1
    }
    assert(done, s"in-memory Lloyd did not converge in $maxIters rounds")
    result
  }

  test("kmeans converges to the in-memory Lloyd fixpoint") {
    val corpus = pts.toDF("vec_id", "embedding")
    val init   = pts.take(4).toDF("vec_id", "embedding")
    val got = Similarity.kmeans(corpus, init, maxIters = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val want = lloydFixpoint(
      pts.map { case (id, v) => (id, v.map(_.toDouble)) },
      pts.take(4).map { case (id, v) => id -> v.map(_.toDouble) }.toMap,
      maxIters = 20)
      .map { case (cell, (n, q)) => cell -> (n, q.mkString(" ")) }
    assert(got == want,
      s"kmeans fixpoint diverged from in-memory Lloyd\n spark=$got\n mirror=$want")
    // every point accounted for, well-separated seeds keep all 4 cells alive
    assert(got.values.map(_._1).sum == 120L && got.size == 4)
  }

  test("kmeansIterate past the convergence round equals the converged kmeans") {
    val corpus = pts.toDF("vec_id", "embedding")
    val init   = pts.take(4).toDF("vec_id", "embedding")
    val fixed = Similarity.kmeansIterate(corpus, init, iters = 10)
      .collect().map(_.toString).toSet
    val conv = Similarity.kmeans(corpus, init, maxIters = 20)
      .collect().map(_.toString).toSet
    assert(fixed == conv, "a converged loop must be a fixpoint of further iterations")
  }

  test("powerIteration recovers a planted rank-1 component exactly; deterministic") {
    // x_i = i * (3, 4): pure rank-1, top eigenvector (0.6, 0.8),
    // eigenvalue 25 * sum(i^2), explained variance ratio exactly 1
    val planted = (1 to 50).map(i => (i.toLong, Array(3f * i, 4f * i)))
      .toDF("vec_id", "embedding")
    val row = Similarity.powerIteration(planted, rounds = 3).collect().head
    assert(row.getInt(0) == 2 && row.getInt(1) == 3)
    val sumSq = (1 to 50).map(i => i.toLong * i).sum.toDouble
    assert(math.abs(row.getDouble(2) - 25.0 * sumSq) < 0.01,
      s"eigenvalue ${row.getDouble(2)} vs ${25.0 * sumSq}")
    assert(row.getDouble(3) >= 0.999999, s"rank-1 data explains everything: ${row.getDouble(3)}")
    assert(row.getString(4) == "600000 800000", s"unit eigenvector: ${row.getString(4)}")
    val again = Similarity.powerIteration(planted, rounds = 3).collect().head
    assert(row.toString == again.toString, "must be rerun-identical")
  }

  test("powerIterationTop: deflation recovers both planted axes; EVRs split 0.8/0.2 and sum to 1") {
    // rank-2 with orthogonal axis groups: (2i, 0) and (0, i) -> eigvecs
    // e1 (lambda 4*sum i^2) then e2 (lambda sum i^2); EVR 4/5 and 1/5
    val planted = ((1 to 30).map(i => (i.toLong, Array(2f * i, 0f))) ++
      (1 to 30).map(i => (100L + i, Array(0f, i.toFloat))))
      .toDF("vec_id", "embedding")
    // power iteration converges GEOMETRICALLY (rate lambda2/lambda1 = 1/4
    // per round), so after finitely many rounds the axes are recovered to
    // tolerance, not exactly — assert alignment, spectrum, and EVR split
    val rows = Similarity.powerIterationTop(planted, components = 2, rounds = 8)
      .orderBy("component").collect()
    val sumSq = (1 to 30).map(i => i.toLong * i).sum.toDouble
    assert(rows.length == 2)
    val c1 = rows(0); val c2 = rows(1)
    def vec(r: org.apache.spark.sql.Row) = r.getString(5).split(" ").map(_.toDouble / 1e6)
    val (v1, v2) = (vec(c1), vec(c2))
    assert(math.abs(v1(0)) > 0.9999 && math.abs(v2(1)) > 0.9999,
      s"axes recovered: ${v1.toSeq} / ${v2.toSeq}")
    assert(math.abs(v1(0) * v2(0) + v1(1) * v2(1)) < 1e-3, "components near-orthogonal")
    assert(math.abs(c1.getDouble(3) - 4.0 * sumSq) / (4.0 * sumSq) < 0.01, s"lambda1 ${c1.getDouble(3)}")
    assert(math.abs(c2.getDouble(3) - sumSq) / sumSq < 0.02, s"lambda2 ${c2.getDouble(3)}")
    assert(math.abs(c1.getDouble(4) - 0.8) < 0.01 && math.abs(c2.getDouble(4) - 0.2) < 0.01,
      s"EVRs against the ORIGINAL variance: ${c1.getDouble(4)} / ${c2.getDouble(4)}")
  }

  // -------------------------------------------------- k-means|| init

  test("kmeansParallelInit: weights partition the corpus; seed is the min id; rerun-identical") {
    val df = pts.toDF("vec_id", "embedding")
    def run() = Similarity
      .kmeansParallelInit(df, rounds = 3, oversample = 8, capPerRound = 32)
      .orderBy("center_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val got = run()
    assert(got == run(), "init must replay identically")
    assert(got.head._1 == 0L && got.head._2 == 0, "round-0 seed is the min-id row")
    assert(got.map(_._3).sum == pts.length.toLong,
      "attraction weights must partition every point exactly once")
    assert(got.count(_._2 > 0) >= 1, "oversampling rounds must draw candidates")
  }

  test("kmeansParallelInit: candidates cover all planted clusters and feed Lloyd") {
    // 4 tight, well-separated clusters: after 3 oversampling rounds the
    // candidate set must touch every cluster (d^2-weighted sampling pulls
    // candidates toward uncovered mass -- the k-means++ guarantee k-means||
    // parallelizes), so the top-4-by-weight seeds recover one per cluster.
    // separated in BOTH distance (the init's d^2 metric) and angle (the
    // Lloyd loop routes by max cosine): 4 directions at radius 40
    val far = Array(
      Array(40.0, 0.0), Array(0.0, 40.0), Array(-40.0, 0.0), Array(0.0, -40.0))
    val r2 = new java.util.Random(7)
    val data = (0 until 80).map { i =>
      val c = far(i % 4)
      (i.toLong, Array(c(0) + 0.2 * r2.nextGaussian(), c(1) + 0.2 * r2.nextGaussian()))
    }
    val df = data.toDF("vec_id", "embedding")
    val cands = Similarity
      .kmeansParallelInit(df, rounds = 3, oversample = 8, capPerRound = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    def clusterOf(id: Long): Int = (id % 4).toInt
    val covered = cands.map(c => clusterOf(c._1)).toSet
    assert(covered == Set(0, 1, 2, 3),
      s"candidates must cover all 4 planted clusters, got $covered")
    // clusters are far apart, so every point's attraction stays inside its
    // own cluster: per-cluster candidate weights must sum to exactly 20
    val wByCluster = cands.groupBy(c => clusterOf(c._1)).view.mapValues(_.map(_._2).sum)
    assert((0 to 3).forall(wByCluster(_) == 20L),
      s"per-cluster attraction mass: ${wByCluster.toMap}")
    // recluster step (paper step 7, metadata-sized): max-weight candidate
    // per cluster (ties id ASC) seeds Lloyd, which recovers 4 cells of 20
    val seeds = cands.groupBy(c => clusterOf(c._1)).values
      .map(_.minBy { case (id, w) => (-w, id) }._1).toSeq
    val init = df.where(col("vec_id").isin(seeds: _*))
    val cells = Similarity.kmeansIterate(df, init, iters = 3)
      .collect().map(r => r.getLong(1))
    assert(cells.length == 4 && cells.forall(_ == 20L),
      s"Lloyd from k-means|| seeds must recover the 4x20 partition: ${cells.toSeq}")
  }

  test("kmeansParallelInit: capPerRound bounds the candidate count") {
    val df = pts.toDF("vec_id", "embedding")
    val got = Similarity
      .kmeansParallelInit(df, rounds = 3, oversample = 2, capPerRound = 2)
      .collect()
    assert(got.length <= 1 + 3 * 2,
      s"candidate count ${got.length} must be <= 1 + rounds*cap")
  }
}
