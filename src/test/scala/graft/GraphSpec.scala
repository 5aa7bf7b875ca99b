package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank invariants, checked against an INDEPENDENT in-memory
  * implementation (plain Scala maps — no DataFrames) on a small graph, plus
  * structural properties on the sf graph. The DuckDB oracle (q_pagerank)
  * separately pins the full-size values.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def pround(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  // path graph a—b—c—d plus a pendant e off b, symmetrized
  private val rawEdges =
    Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "e"))

  /** Reference PageRank: same fixed-iteration semantics, written against
    * Scala collections so a bug in the DataFrame plan can't self-confirm.
    */
  private def referencePr(edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
    val undirected = (edges ++ edges.map(_.swap)).distinct
    val nodes = undirected.map(_._1).distinct.sorted
    val deg   = undirected.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n     = nodes.size.toDouble
    var pr    = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val mass = undirected
        .groupBy(_._2)
        .view.mapValues(_.map { case (src, _) => pr(src) / deg(src) }.sum)
        .toMap
      pr = nodes.map(v => v -> ((1 - d) / n + d * mass.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("pagerank matches the independent in-memory implementation on a small graph") {
    val expected = referencePr(rawEdges, iters = 5, d = 0.85)
    val got = Graph
      .pagerank(Graph.undirected(rawEdges.toDF("src", "dst")), iters = 5, d = 0.85)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - expected(v)) < 1e-12, s"$v: $p vs ${expected(v)}")
    }
    // the pendant's neighbor is the hub: b must outrank everything
    assert(got("b") == got.values.max)
  }

  test("pagerank mass is conserved (sums to 1) on the sf0.001 graph") {
    val edges = Graph.customerSupplierEdges(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    val pr = Graph.pagerank(edges, iters = 3)
    val total = pr.agg(sum("pr")).head().getDouble(0)
    // undirected ⇒ no dangling nodes ⇒ exact conservation up to fp noise
    assert(math.abs(total - 1.0) < 1e-9, s"sum(pr) = $total")
    // bipartite sanity: every node id carries the c/s prefix
    assert(pr.where(!col("node").rlike("^[cs][0-9]+$")).isEmpty)
  }

  /** Reference personalized PageRank, independent of the DataFrame plan. */
  private def referencePpr(
      edges: Seq[(String, String)], seeds: Set[String], iters: Int, d: Double): Map[String, Double] = {
    val undirected = (edges ++ edges.map(_.swap)).distinct
    val nodes = undirected.map(_._1).distinct.sorted
    val deg   = undirected.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val tele  = nodes.map(v => v -> (if (seeds(v)) 1.0 / seeds.size else 0.0)).toMap
    var pr    = tele
    (1 to iters).foreach { _ =>
      val mass = undirected
        .groupBy(_._2)
        .view.mapValues(_.map { case (src, _) => pr(src) / deg(src) }.sum)
        .toMap
      pr = nodes.map(v => v -> ((1 - d) * tele(v) + d * mass.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("personalized pagerank matches the in-memory mirror; mass conserved; seeds dominate") {
    val seeds = Set("a")
    val expected = referencePpr(rawEdges, seeds, iters = 5, d = 0.85)
    val got = Graph
      .personalizedPagerank(
        Graph.undirected(rawEdges.toDF("src", "dst")),
        seeds.toSeq.toDF("node"), iters = 5, d = 0.85)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - expected(v)) < 1e-12, s"$v: $p vs ${expected(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "teleport-to-seeds conserves unit mass")
    // proximity: mass concentrates around the seed — the seed and its
    // neighbor hold more than the three remote nodes combined. (The seed
    // itself need NOT be the max: with d=0.85 the adjacent hub b collects
    // the teleport mass every round — got(b) > got(a) here.)
    assert(got("a") + got("b") > got("c") + got("d") + got("e"))
  }

  test("degrees: handshake lemma on the symmetrized graph") {
    val e = Graph.undirected(rawEdges.toDF("src", "dst"))
    val degSum = Graph.degrees(e).agg(sum("degree")).head().getLong(0)
    assert(degSum == e.count(), "sum of degrees == directed edge count of the symmetrized graph")
  }

  test("clusteringCoefficients: triangle+pendant hand case; a 4-cycle reads 0 everywhere") {
    // triangle 1-2-3 plus pendant edge 1-4: deg(1)=3 cc=2/6, deg(2)=deg(3)=2
    // cc=1, deg(4)=1 dropped (no neighbor pair)
    val tri = Seq(("1", "2"), ("1", "3"), ("2", "3"), ("1", "4")).toDF("src", "dst")
    val got = Graph.clusteringCoefficients(tri)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map("1" -> (3L, 1L, 0.333333), "2" -> (2L, 1L, 1.0), "3" -> (2L, 1L, 1.0)),
      s"got $got")
    // square a-b-c-d-a: every node deg 2, zero triangles, cc exactly 0
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")).toDF("src", "dst")
    val sq = Graph.clusteringCoefficients(square)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(sq == Map("a" -> 0.0, "b" -> 0.0, "c" -> 0.0, "d" -> 0.0), s"got $sq")
  }

  test("HITS matches the hand-unrolled values on a 2x2 bipartite graph") {
    // c1→{s1,s2}, c2→{s1}; two rounds by hand:
    //   a1: s1=2/3 s2=1/3; h1: c1=3/5 c2=2/5
    //   a2: s1=5/8 s2=3/8; h2: c1=8/13 c2=5/13
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1")).toDF("src", "dst")
    val got = Graph.hits(e, iters = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("s1") == (0.0, 0.625) && got("s2") == (0.0, 0.375),
      s"authorities: $got")
    assert(got("c1") == (0.615385, 0.0) && got("c2") == (0.384615, 0.0),
      s"hubs: $got")
  }

  test("HITS scores are L1-normalized and pure sources/sinks score 0 on the other axis") {
    val e = rawEdges.toDF("src", "dst") // directed path + pendant
    val rows = Graph.hits(e, iters = 3).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "hub mass sums to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "auth mass sums to 1")
    val m = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("a")._2 == 0.0, "a has no in-edges: zero authority")
    assert(m("d")._1 == 0.0 && m("e")._1 == 0.0, "sinks have zero hub score")
  }

  test("labelPropagation separates two bridged triangles (hand-traced)") {
    // triangles {a,b,c} and {d,e,f} joined by bridge c—d. Hand trace of
    // the self-vote sync rounds (votes DESC, label ASC):
    //   r1: everyone ties at 1 vote → min(self ∪ neighbors):
    //       a,b,c→a  d→c  e,f→d
    //   r2: a,b,c→a  d,e,f→d   r3: unchanged (fixpoint)
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("src", "dst")
    val got = Graph.labelPropagation(e, iters = 4)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "d"), s"got $got")
  }

  test("labelPropagation self-vote reaches a fixpoint on bipartite structure (no 2-cycle)") {
    // K2,3: pure synchronous LPA provably flips between two standing
    // label sets on complete bipartite graphs forever; the self-vote
    // form must converge (iters and iters+1 agree) to one community
    val e = (for { l <- Seq("a", "b"); r <- Seq("x", "y", "z") } yield (l, r))
      .toDF("src", "dst")
    val at3 = Graph.labelPropagation(e, iters = 3).as[(String, String)].collect().toMap
    val at4 = Graph.labelPropagation(e, iters = 4).as[(String, String)].collect().toMap
    assert(at3 == at4, s"oscillation: $at3 vs $at4")
    assert(at3.values.toSet.size == 1, s"K2,3 is one community: $at3")
  }

  test("kCore peels the cascading chain off a triangle (hand case)") {
    // triangle a,b,c plus chain c—d—e at k=2: e (deg 1) peels first,
    // which drops d to deg 1 — the 2-round cascade — leaving the
    // triangle, every survivor at degree exactly 2
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val got = Graph.kCore(e, k = 2, rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), s"got $got")
  }

  test("kCore at the query's rounds is a fixpoint on the sf0.001 same-nation graph") {
    val edges = Graph.sameNationEdges(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
      spark.read.parquet("/root/testdata/sf0.001/supplier.parquet"))
    val at6 = Graph.kCore(edges, k = 4, rounds = 6).as[(String, Long)].collect().toMap
    val at7 = Graph.kCore(edges, k = 4, rounds = 7).as[(String, Long)].collect().toMap
    assert(at6 == at7, "one extra peel round changed the core: rounds=6 is not the fixpoint")
    assert(at6.values.forall(_ >= 4), "a surviving node has degree < k")
  }

  test("degreeAssortativity: path and star read -1, a regular cycle reads NULL") {
    // P3: Σjk=8, Σj=6, Σj²=10 over m=4 directed edges → (32−36)/(40−36) = −1
    val path = Seq(("1", "2"), ("2", "3")).toDF("src", "dst")
    val p = Graph.degreeAssortativity(path).collect().head
    assert(p.getLong(0) == 4 && p.getDouble(1) == -1.0, s"path: $p")
    val star = Seq(("0", "a"), ("0", "b"), ("0", "c")).toDF("src", "dst")
    val s = Graph.degreeAssortativity(star).collect().head
    assert(s.getLong(0) == 6 && s.getDouble(1) == -1.0, s"star: $s")
    // C3 is 2-regular: zero degree variance, r undefined
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val c = Graph.degreeAssortativity(cyc).collect().head
    assert(c.getLong(0) == 6 && c.isNullAt(1), s"cycle: $c")
  }

  test("adamicAdar: C4 hand case; hub cap drops only the hub's wedges") {
    // cycle 1-2-3-4: non-adjacent diagonals (1,3) and (2,4), each with two
    // deg-2 common neighbors → AA = 2/ln 2
    val c4 = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "1")).toDF("src", "dst")
    val got = Graph.adamicAdar(c4, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val aa2 = pround(2.0 / math.log(2.0), 6)
    assert(got.toSeq == Seq(("1", "3", 2L, aa2), ("2", "4", 2L, aa2)), s"c4: ${got.toSeq}")
    // x,y share hub h (deg 5) and low-deg w (deg 2); h,w share x and y.
    // Capping at 4 removes only h's wedges: (x,y) loses the hub term,
    // (h,w) keeps both deg-2 witnesses
    val hub = Seq(("h", "x"), ("h", "y"), ("h", "p1"), ("h", "p2"), ("h", "p3"),
      ("w", "x"), ("w", "y")).toDF("src", "dst")
    val full = Graph.adamicAdar(hub, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(full.toSeq == Seq(
      ("h", "w", 2L, aa2),
      ("x", "y", 2L, pround(1.0 / math.log(5.0) + 1.0 / math.log(2.0), 6))),
      s"uncapped: ${full.toSeq}")
    val capped = Graph.adamicAdar(hub, k = 2, maxHubDegree = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(capped.toSeq == Seq(
      ("h", "w", 2L, aa2),
      ("x", "y", 1L, pround(1.0 / math.log(2.0), 6))),
      s"capped: ${capped.toSeq}")
  }

  test("modularity: disconnected cliques read Q=1/2; a bridge dilutes both sides") {
    val twoTri = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d")).toDF("src", "dst")
    val labels = Seq(("a", "X"), ("b", "X"), ("c", "X"),
      ("d", "Y"), ("e", "Y"), ("f", "Y")).toDF("node", "label")
    val got = Graph.modularity(twoTri, labels)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // per clique: e_in/2m − (d/2m)² = 6/12 − (6/12)² = 0.25 → Q = 0.5
    assert(got.toSeq == Seq(("X", 3L, 6L, 6L, 0.25), ("Y", 3L, 6L, 6L, 0.25)),
      s"cliques: ${got.toSeq}")
    val bridged = twoTri.unionAll(Seq(("c", "d")).toDF("src", "dst"))
    val gotB = Graph.modularity(bridged, labels)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4)))
    val contrib = pround(6.0 / 14.0 - (7.0 / 14.0) * (7.0 / 14.0), 6)
    assert(gotB.toSeq == Seq(("X", 6L, contrib), ("Y", 6L, contrib)),
      s"bridged: ${gotB.toSeq}")
  }

  test("bfsDistances: path distances, multi-seed min, unreached absent, round fixpoint") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
      .toDF("src", "dst")
    val one = Graph.bfsDistances(path, Seq("a"), rounds = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(one.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L), ("d", 3L), ("e", 4L)),
      s"single seed: ${one.toSeq}")
    val two = Graph.bfsDistances(path, Seq("a", "e"), rounds = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(two.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L), ("d", 1L), ("e", 0L)),
      s"multi seed: ${two.toSeq}")
    // rounds beyond the eccentricity are a fixpoint
    val at4 = Graph.bfsDistances(path, Seq("a"), rounds = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(at4.toSeq == one.toSeq, "rounds=4 is not the fixpoint")
  }

  test("degreeAssortativity repairs dirty input (dupes, self-loops, one-directional)") {
    val clean = Seq(("1", "2"), ("2", "3")).toDF("src", "dst")
    val dirty = Seq(("1", "2"), ("1", "2"), ("2", "1"), ("2", "2"), ("2", "3"))
      .toDF("src", "dst")
    assert(Graph.degreeAssortativity(dirty).collect().toSeq
      == Graph.degreeAssortativity(clean).collect().toSeq)
  }

  test("edgeEmbeddedness: triangle edges carry their common neighbor, the pendant is a bridge") {
    // triangle a-b-c plus pendant d on c
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")).toDF("src", "dst")
    val got = Graph.edgeEmbeddedness(g)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3), r.getBoolean(4)))
      .toMap
    // (a,b): common {c}; union = (2-1)+(2-1)-1 = 1 -> jaccard 1.0
    assert(got(("a", "b")) == ((1L, 1.0, false)), s"ab: $got")
    // (a,c): common {b}; union = N(a)∖{c} ∪ N(c)∖{a} = {b,d} -> 0.5
    assert(got(("a", "c")) == ((1L, 0.5, false)), s"ac: $got")
    assert(got(("b", "c")) == ((1L, 0.5, false)), s"bc: $got")
    // (c,d): no common neighbor; union = (3-1)+(1-1)-0 = 2 -> 0.0, bridge
    assert(got(("c", "d")) == ((0L, 0.0, true)), s"cd: $got")
    // two pendant nodes joined by an edge: empty union reads NULL, bridge
    val lone = Graph.edgeEmbeddedness(Seq(("p", "q")).toDF("src", "dst")).collect().head
    assert(lone.getLong(2) == 0L && lone.isNullAt(3) && lone.getBoolean(4), s"lone: $lone")
    // dirty input (dup / bidirectional / self-loop) repaired to canonical
    val dirty = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("b", "c"),
      ("a", "c"), ("c", "d")).toDF("src", "dst")
    assert(Graph.edgeEmbeddedness(dirty).orderBy("src", "dst").collect().toSeq
      == Graph.edgeEmbeddedness(g).orderBy("src", "dst").collect().toSeq)
  }

  test("landmarkCloseness: path-graph harmonics exact, absent landmark ignored, round fixpoint") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    def harm(ds: Seq[Long]): Double = {
      val scaled = ds.filter(_ > 0).map(d => math.floor(1.0 / d * 1e6 + 0.5).toLong).sum
      pround(scaled.toDouble / 1e6, 6)
    }
    val got = Graph.landmarkCloseness(path, Seq("a", "d"), rounds = 6)
      .orderBy("node")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", 2L, harm(Seq(0L, 3L))), ("b", 2L, harm(Seq(1L, 2L))),
      ("c", 2L, harm(Seq(2L, 1L))), ("d", 2L, harm(Seq(3L, 0L)))),
      s"path: ${got.toSeq}")
    // a landmark not present in the graph contributes nothing
    val withGhost = Graph.landmarkCloseness(path, Seq("a", "d", "zz"), rounds = 6)
      .orderBy("node")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(withGhost.toSeq == got.toSeq, s"ghost landmark: ${withGhost.toSeq}")
    // rounds beyond the eccentricity are a fixpoint
    val at3 = Graph.landmarkCloseness(path, Seq("a", "d"), rounds = 3)
      .orderBy("node")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(at3.toSeq == got.toSeq, "rounds=3 is not the fixpoint")
  }

  test("kTruss: K4 survives k=4, a pendant triangle and edge peel; supports exact") {
    import spark.implicits._
    // K4 on {a,b,c,d} + triangle {d,e,f} hanging off d + pendant f-g
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"))
    val edges = (k4 ++ Seq(("d", "e"), ("d", "f"), ("e", "f"), ("f", "g")))
      .toDF("src", "dst")
    val got = Graph.kTruss(edges, k = 4, rounds = 3)
      .orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every K4 edge closes exactly 2 triangles; the triangle (support 1)
    // and the pendant (support 0) peel
    assert(got.toSeq == k4.map { case (s, d) => (s, d, 2L) }, s"got: ${got.toSeq}")
    // k=3 keeps the triangle too (support 1 >= k-2), sheds only the pendant
    val k3 = Graph.kTruss(edges, k = 3, rounds = 3)
      .orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(k3.toSeq == (k4.map { case (s, d) => (s, d, 2L) }
      ++ Seq(("d", "e", 1L), ("d", "f", 1L), ("e", "f", 1L))), s"k3: ${k3.toSeq}")
  }

  test("kTruss: the K5-minus-an-edge cascade peels to empty; support recomputes on survivors") {
    import spark.implicits._
    // K5 minus (a,b): edges touching a or b have support 2 < 3, the rest 3
    val nodes = Seq("a", "b", "c", "d", "e")
    val edges = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if !(nodes(i) == "a" && nodes(j) == "b")
    } yield (nodes(i), nodes(j))).toDF("src", "dst")
    // one round peels a/b edges; the surviving {c,d,e} triangle reads its
    // RECOMPUTED support 1 (not its pre-peel 3) — the final left-join pass
    val one = Graph.kTruss(edges, k = 5, rounds = 1)
      .orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(one.toSeq == Seq(("c", "d", 1L), ("c", "e", 1L), ("d", "e", 1L)),
      s"one round: ${one.toSeq}")
    // the cascade then kills the triangle: 2+ rounds reach the empty fixpoint
    assert(Graph.kTruss(edges, k = 5, rounds = 3).count() == 0L, "cascade must empty the graph")
  }

  test("kTrussCertified surfaces the convergence certificate") {
    import spark.implicits._
    // K5 minus (a,b): k=5 needs 2 rounds to certify the empty fixpoint
    val nodes = Seq("a", "b", "c", "d", "e")
    val edges = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if !(nodes(i) == "a" && nodes(j) == "b")
    } yield (nodes(i), nodes(j))).toDF("src", "dst")
    // rounds=1 truncates mid-cascade: output is a SUPERSET (the {c,d,e}
    // triangle at support 1 < k-2 survives) and the flag says so
    val (one, c1) = Graph.kTrussCertified(edges, k = 5, rounds = 1)
    assert(!c1, "one round cannot certify this cascade")
    assert(one.count() == 3L)
    // enough rounds: certified fixpoint, empty truss
    val (full, c2) = Graph.kTrussCertified(edges, k = 5, rounds = 5)
    assert(c2, "5 rounds must certify the fixpoint")
    assert(full.count() == 0L)
  }

  test("kTruss fuzz: == the sequential peel-to-fixpoint on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(2015L)
    def support(edges: Set[(String, String)]): Map[(String, String), Int] = {
      val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
      edges.map { case e @ (a, b) => e -> (adj(a) & adj(b)).size }.toMap
    }
    for (c <- 0 until 6) {
      val n = 8 + rnd.nextInt(8)
      val nodes = (0 until n).map(i => f"n$i%02d")
      val es = for {
        i <- 0 until n; j <- (i + 1) until n if rnd.nextDouble() < 0.35
      } yield (nodes(i), nodes(j))
      val k = 3 + rnd.nextInt(3)
      if (es.nonEmpty) {
        var cur = es.toSet
        var changed = true
        while (changed) {
          val keep = support(cur).filter(_._2 >= k - 2).keySet
          changed = keep != cur
          cur = keep
        }
        val want = support(cur).map { case (e, s) => e -> s.toLong }
        // rounds = 20 exceeds any cascade depth on <= 16 nodes; the
        // operator's count-fixpoint exit makes the slack free
        val got = Graph.kTruss(es.toDF("src", "dst"), k, rounds = 20)
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(got == want, s"case $c k=$k: $got vs $want")
      }
    }
  }
}
