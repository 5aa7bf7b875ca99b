package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Iterative graph analytics over relational edge lists — the PageRank /
  * degree-analysis family a data-curation pipeline uses to weight sources
  * (e.g. rank hosts in a crawl graph before sampling from them).
  *
  * The graph is any (src, dst) DataFrame; [[undirected]] symmetrizes it.
  * PageRank here is the fixed-iteration declarative form: each iteration
  * is contribution-join → sum-by-dst → teleport, composed as ONE logical
  * plan (no driver-side collect — the only scalars, node count and degree,
  * stay in broadcast subtrees). A production run at web scale would insert
  * a localCheckpoint every few iterations to cut lineage (exactly as
  * [[Dedup.duplicateGroups]] does); at oracle scale the pure plan keeps
  * the whole computation visible to Catalyst and the DuckDB mirror.
  */
object Graph {

  /** Symmetrize + dedupe an edge list (simple undirected graph: both
    * directions present, no self-loops, no multi-edges).
    */
  def undirected(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst").where(col("src") =!= col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Per-node degree of an undirected edge list (one exchange on src). */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))

  /** Fixed-iteration PageRank with damping `d` over an UNDIRECTED edge
    * list ([[undirected]] output). Every node has degree >= 1, so there are
    * no dangling nodes and mass is conserved exactly:
    *
    *   pr_0(v)   = 1/N
    *   pr_i+1(v) = (1-d)/N + d * sum_{u->v} pr_i(u)/deg(u)
    *
    * Returns (node, pr). Each iteration shuffles once on dst for the
    * contribution sum; the degree table joins in broadcast (node count <<
    * edge count), and the teleport scalar 1/N rides a broadcast
    * one-row cross join, keeping the whole computation declarative.
    */
  def pagerank(edges: DataFrame, iters: Int = 5, d: Double = 0.85): DataFrame = {
    val deg = degrees(edges)
    val n1  = broadcast(deg.agg(count(lit(1)).cast("double").as("n")))
    val init = deg
      .crossJoin(n1)
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
    (1 to iters).foldLeft(init) { (pr, _) =>
      edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(broadcast(deg.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("degree")).as("mass"))
        .crossJoin(n1)
        .select(col("node"), ((lit(1.0) - d) / col("n") + lit(d) * col("mass")).as("pr"))
    }
  }

  /** The demo graph for the oracle queries: the bipartite customer–supplier
    * relation (an order's customer bought from each of its line items'
    * suppliers), symmetrized. Node ids carry a c/s prefix so the two key
    * spaces can't collide.
    */
  def customerSupplierEdges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    undirected(
      orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(
          concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")))

  /** PageRank rounded for the hash compare: summation order across an
    * exchange is engine-chosen, so scores are rounded to 6 dp on both
    * sides (values sit at ~1/N ≈ 1e-3/1e-4; fp noise is ~1e-15).
    */
  def pagerankRounded(edges: DataFrame, iters: Int = 5, d: Double = 0.85): DataFrame =
    pagerank(edges, iters, d)
      .select(col("node"), Portable.pround(col("pr"), 6).as("pr"))
}
