package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual semi-join reduction: prune the BIG side of an equi-join with a
  * bloom filter built from the SMALL side's keys, BEFORE the join
  * shuffle. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling only the rows that can possibly match — the
  * same transformation Spark's runtime-filter optimization
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies when its
  * own heuristics fire; this form makes it deterministic and available
  * to any pipeline, including ones the optimizer's size thresholds skip.
  *
  * Built on Spark's OWN bloom expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, surfaced as `graft_bloom_agg` /
  * `graft_might_contain` by [[graft.GraftExtensions]]) over `xxhash64`
  * of the key: the filter is a byte-array aggregate (partial map-side,
  * mergeable), attached as a SCALAR SUBQUERY (`Dataset.scalar()` — the
  * only bloom input `might_contain` accepts besides a literal; the
  * subquery result ships to every task like a broadcast var), and the
  * probe is a codegen'd expression in the big side's scan stage — no
  * UDF, no driver-side build, no second pass.
  *
  * Bloom filters have false POSITIVES only, so pruning never drops a
  * matching row: result == big.join(small, key) exactly (BloomJoinSpec
  * pins equality; the oracle for the consuming query is the plain join).
  */
object BloomJoin {

  /** `big ⋈ small` on `key`, with the big side bloom-pruned first.
    * `expectedItems` sizes the filter (distinct small-side keys);
    * `numBits` bounds its memory (default 8× items ≈ 2% fpp).
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      expectedItems: Long = 1L << 20,
      numBits: Long = 0L): DataFrame = {
    require(expectedItems > 0, s"expectedItems ($expectedItems) must be positive")
    val bits = if (numBits > 0) numBits else expectedItems * 8
    val bf = small.agg(
      expr(s"graft_bloom_agg(xxhash64($key), ${expectedItems}L, ${bits}L)").as("__bf"))
      .scalar()
    big
      .where(call_function("graft_might_contain", bf, xxhash64(col(key))))
      .join(small, Seq(key))
  }
}
