package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Collaborative-filtering primitives over relational interaction data —
  * the "what belongs together" signal a curation pipeline uses to build
  * contrastive pairs, session-aware mixtures, and popularity-deconfounded
  * item scores (the raw count ranks what's bought a lot; the factor ranks
  * what's bought by HIGH-ENGAGEMENT buyers).
  *
  * Everything here follows the engine's exact-replay discipline: latent
  * factors live as 6-dp-SCALED INTEGERS between half-steps, so every
  * aggregate the solver takes is an exact decimal sum (no float
  * partial-agg order can flip a bit) and the fixed-iteration result
  * replays bit-identically in the DuckDB oracle.
  */
object Recommend {

  /** Rank-1 alternating least squares for implicit feedback (the scalar
    * core of Hu, Koren & Volinsky, "Collaborative Filtering for Implicit
    * Feedback Datasets", ICDM 2008; rank 1 is the power iteration on the
    * rating matrix's dominant singular pair). Per round, with observed
    * cells only:
    *
    *   u_i = Σ_{j∈J(i)} r_ij·v_j / Σ_{j∈J(i)} v_j²
    *   v_j = Σ_{i∈I(j)} r_ij·u_i / Σ_{i∈I(j)} u_i²
    *
    * Determinism: factors are QUANTIZED to 6 dp after every half-step
    * and carried as scaled longs, so the next half-step's numerator
    * (Σ r·v6, integers) and denominator (Σ v6², integers) are exact
    * decimal(38,0) sums — the [[Stats.welchTTest]] discipline — and the
    * division `N·1e6/D` is one fixed-order scalar op. The alternative
    * (raw double factors) leaves both sums at the mercy of partial-agg
    * order and cannot hash-match cross-engine.
    *
    * Scale shape: the ratings relation is materialized ONCE
    * (checkpoint); each half-step is one broadcastable factor join
    * (factor tables are user-/item-sized, orders of magnitude below the
    * interaction relation) plus one partial-agg groupBy — the same
    * two-shuffle round as [[Graph.pagerank]], and on a cluster the
    * factor joins stay co-partitioned with the cached ratings. A cell
    * whose denominator quantizes to 0 (all its factors rounded away)
    * reads factor 0 instead of an ANSI divide error.
    *
    * Returns the ITEM factor table (item, n_users, v_r) after `iters`
    * full rounds from v ≡ 1 — v_r is the implicit-feedback item score.
    */
  def alsRank1(
      ratings: DataFrame,
      userCol: String,
      itemCol: String,
      ratingCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val r = ratings
      .select(col(userCol).as("__u"), col(itemCol).as("__i"),
        col(ratingCol).cast("long").as("__r"))
      .where(col("__u").isNotNull && col("__i").isNotNull && col("__r").isNotNull)
      .localCheckpoint(true)
    val nUsers = r.groupBy(col("__i")).agg(countDistinct(col("__u")).as("n_users"))
    val vInit = r.select(col("__i").as("__k")).distinct()
      .withColumn("__f6", lit(1000000L))
    val vFinal = (1 to iters).foldLeft(vInit) { (v, _) =>
      val u = alsHalfStep(r, "__u", v, "__i").localCheckpoint(true)
      alsHalfStep(r, "__i", u, "__u").localCheckpoint(true)
    }
    vFinal
      .join(nUsers, col("__k") === col("__i"))
      .select(col("__k").as(itemCol), col("n_users"),
        Portable.pround(col("__f6").cast("double") / lit(1e6), 6).as("v_r"))
  }

  /** One ALS half-step: solve one side's factors against the other's
    * quantized table — the representative-iteration plan the audit
    * checks (the real loop hides each half-step behind a checkpoint).
    * `ratings` carries (__u, __i, __r); `factors` carries (__k, __f6).
    */
  def alsHalfStep(
      ratings: DataFrame,
      keyCol: String,
      factors: DataFrame,
      facKey: String): DataFrame =
    ratings.join(broadcast(factors.withColumnRenamed("__k", facKey)), Seq(facKey))
      .groupBy(col(keyCol).as("__k"))
      .agg(
        sum(col("__r").cast("decimal(38,0)") * col("__f6")).as("__n"),
        sum(col("__f6").cast("decimal(38,0)") * col("__f6")).as("__d"))
      .select(col("__k"),
        // N/1e6 ÷ D/1e12 = N·1e6/D, quantized straight back to 6 dp
        when(col("__d") > 0,
          floor(col("__n").cast("double") * lit(1e6) / col("__d").cast("double")
            * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("__f6"))

  /** Item–item cosine similarity from co-basket counts (Sarwar et al.,
    * WWW 2001): cos(i,j) = co(i,j)/√(n_i·n_j) over the binary
    * order–item matrix — the memory-based neighbor model behind "bought
    * together" and the contrastive-pair miner for training data (the
    * [[alsRank1]] factor ranks items globally; this ranks each item's
    * NEIGHBORS). Top-k per item with a (cos DESC, neighbor) total order.
    *
    * Scale shape: the pair expansion is the within-basket self-join —
    * Σ_orders b² where b is basket size, bounded by order structure (a
    * TPC-H order holds ≤ 7 parts), NEVER the item-vocabulary square; the
    * `minCo` floor (mirrored in the oracle) prunes noise pairs before
    * the count relation materializes, and the per-item rank rides a
    * PARTITIONED window over the already-pruned pair relation. Baskets
    * with pathological sizes would need the dedup family's cap
    * discipline — for relational order data the bound is structural.
    * Cosine is one fixed-order scalar from exact integer counts.
    *
    * Returns (item, neighbor, co, cos_r, rank ≤ k) ordered by (item,
    * rank); pairs below `minCo` baskets never appear.
    */
  def itemItemCosine(
      lineitem: DataFrame,
      minCo: Long = 2,
      k: Int = 3,
      assumeDistinct: Boolean = false): DataFrame = {
    require(minCo >= 1 && k >= 1, s"minCo ($minCo) and k ($k) must be >= 1")
    // r20: materialized ONCE — the distinct basket relation feeds BOTH
    // self-join sides and the per-item counts; the join sides share one
    // hash-on-__ok exchange (ReuseExchange) but ni's groupBy(__it) is a
    // different axis and re-ran the whole scan+distinct per consumer.
    // `assumeDistinct` lets a caller holding an already-(order, item)-
    // distinct, already-materialized relation (hitRateEval's trainLi)
    // skip the redundant dedup shuffle and second materialization.
    val obRaw = lineitem
      .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__it"))
    val ob = if (assumeDistinct) obRaw else obRaw.distinct().localCheckpoint(true)
    val ni = ob.groupBy(col("__it")).agg(count(lit(1)).as("__n"))
    val pairs = ob.as("a")
      .join(ob.as("b"), col("a.__ok") === col("b.__ok") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("__i"), col("b.__it").as("__j"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= minCo)
    val scored = pairs
      .join(ni.select(col("__it").as("__i"), col("__n").as("__ni")), Seq("__i"))
      .join(ni.select(col("__it").as("__j"), col("__n").as("__nj")), Seq("__j"))
      .select(col("__i"), col("__j"), col("co"),
        Portable.pround(
          col("co").cast("double")
            / sqrt(col("__ni").cast("double") * col("__nj").cast("double")),
          6).as("cos_r"))
    // r20: one explode instead of a two-branch union — each branch
    // RE-EXECUTED the basket self-join + count + both degree joins (the
    // dominant work); same symmetric row multiset
    val sym = scored
      .select(explode(array(
        struct(col("__i").as("item"), col("__j").as("neighbor"), col("co"), col("cos_r")),
        struct(col("__j").as("item"), col("__i").as("neighbor"), col("co"), col("cos_r"))))
        .as("__s"))
      .select(col("__s.item").as("item"), col("__s.neighbor").as("neighbor"),
        col("__s.co").as("co"), col("__s.cos_r").as("cos_r"))
    val w = Window.partitionBy(col("item")).orderBy(col("cos_r").desc, col("neighbor"))
    sym
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy("item", "rank")
  }

  /** Leave-last-basket-out hit-rate@k — the offline recommender eval
    * (the MovieLens-protocol standard): each ≥2-order customer's LAST
    * order (by date, orderkey tiebreak) is held out, [[itemItemCosine]]
    * trains on the earlier orders only (no leakage), and a customer
    * scores a hit when any held-out item appears in their top-`k`
    * recommendations. The POPULARITY top-k rides the same denominator —
    * a CF run that can't beat "recommend the bestsellers to everyone"
    * isn't learning anything, and without the baseline row the hit rate
    * is an uninterpretable absolute.
    *
    * Scale shape: the train/held split is one max_by per customer + a
    * tagged join; recommendation scoring joins each user's train items
    * against the item-sized top-simK neighbor lists, aggregates
    * per-(user, candidate) — candidate fan-out ≤ trainItems·simK per
    * user — anti-joins the already-seen items, and ranks inside
    * per-USER windows (user-basket-bounded, never global). Per-candidate
    * scores sum 6-dp-rounded cosines 1e6-scaled into exact longs, so
    * ranking replays exactly; the popularity cut is a bounded
    * TakeOrdered. Output is TWO rows.
    *
    * Returns (method, n_users, n_hit, hitrate_r) for method ∈
    * {itemcf, popularity}; users whose training items have no
    * neighbors simply miss — they are not dropped from the denominator.
    */
  def hitRateEval(
      orders: DataFrame,
      lineitem: DataFrame,
      k: Int = 10,
      minCo: Long = 2,
      simK: Int = 3): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val uo = orders.select(
      col("o_custkey").as("cust"), col("o_orderkey").as("ok"), col("o_orderdate").as("dt"))
    val lastPer = uo
      .groupBy(col("cust"))
      .agg(count(lit(1)).as("__no"), max(struct(col("dt"), col("ok"))).as("__last"))
      .where(col("__no") >= 2)
      .select(col("cust"), col("__last.ok").as("last_ok"))
      .localCheckpoint(true)
    val li = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
    val tagged = li
      .join(uo.select(col("cust"), col("ok")), Seq("ok"))
      .join(lastPer, Seq("cust"))
      .localCheckpoint(true)
    // r20: the held-out and train (cust, it) relations formerly deduped
    // in two separate shuffles over the same checkpointed input; ONE
    // groupBy(cust, it) now carries both membership flags and each side
    // is a filter over the shared materialization. trainLi needs no
    // dedup at all — `tagged` is already (ok, it)-distinct by
    // construction (li is deduped on (ok, it) and both joins attach
    // exactly one cust / last_ok per ok), so its former distinct was a
    // full redundant shuffle.
    val custItems = tagged
      .groupBy(col("cust"), col("it"))
      .agg(
        max((col("ok") === col("last_ok")).cast("int")).as("__held"),
        max((col("ok") =!= col("last_ok")).cast("int")).as("__train"))
      .localCheckpoint(true)
    val held = custItems.where(col("__held") === 1).select(col("cust"), col("it"))
    val trainLi = tagged.where(col("ok") =!= col("last_ok"))
      .select(col("ok").as("l_orderkey"), col("it").as("l_partkey"))
      .localCheckpoint(true)
    val userItems = custItems.where(col("__train") === 1).select(col("cust"), col("it"))
    val sims = itemItemCosine(trainLi, minCo, simK, assumeDistinct = true)
      .select(col("item").as("it"), col("neighbor"), col("cos_r"))
    val recs = userItems
      .join(sims, Seq("it"))
      .groupBy(col("cust"), col("neighbor"))
      .agg(sum(floor(col("cos_r") * 1e6 + lit(0.5)).cast("long")).as("__s6"))
      .join(userItems.select(col("cust"), col("it").as("neighbor")),
        Seq("cust", "neighbor"), "left_anti")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("cust")).orderBy(col("__s6").desc, col("neighbor").asc)))
      .where(col("__rk") <= k)
    val cfHitUsers = recs.select(col("cust"), col("neighbor").as("it"))
      .join(held, Seq("cust", "it"), "left_semi")
      .select(col("cust")).distinct()
    val pop = trainLi
      .groupBy(col("l_partkey").as("it"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("it").asc)
      .limit(k)
    val popHitUsers = held
      .join(broadcast(pop.select(col("it"))), Seq("it"), "left_semi")
      .select(col("cust")).distinct()
    def methodRow(method: String, hitUsers: DataFrame) =
      lastPer.agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(hitUsers.agg(count(lit(1)).as("n_hit"))))
        .select(lit(method).as("method"), col("n_users"), col("n_hit"),
          Portable.pround(
            col("n_hit").cast("double") / col("n_users").cast("double"), 6).as("hitrate_r"))
    methodRow("itemcf", cfHitUsers).unionAll(methodRow("popularity", popHitUsers))
  }
}
