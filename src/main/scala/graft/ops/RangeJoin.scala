package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pure range join (no equi key): pairs (l, r) with |l.ts − r.ts| ≤ W.
 * Spark plans a bare theta-join as BroadcastNestedLoop or cartesian —
 * O(N·M) at any scale. The standard fix is TEMPORAL BINNING, applied
 * here: bucket both sides by `ts div W`; a pair within W is always in
 * the same or adjacent buckets, so replicating one side into its 3
 * neighboring buckets and equi-joining on the bucket id turns the join
 * into a shuffle on bucket with only near-diagonal candidates, then the
 * exact band predicate filters residually. Cost scales with Σ(bucket
 * pair sizes) — data-proportional for time-spread events — instead of
 * N·M. A skewed bucket (everything in one window) degrades like any hot
 * key; salt upstream if one dominates.
 */
object RangeJoin {

  /**
   * Candidate-complete pairs within `window` of each other, every pair
   * exactly once. Columns of both inputs must be disjoint.
   */
  def withinWindow(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val lB = left.withColumn("__lb", floor(col(leftTs) / window))
    // each right row visits its own and both adjacent buckets, so every
    // within-window pair co-locates exactly once on (__lb == one visit)
    val rB = right.withColumn("__rb",
      explode(array(floor(col(rightTs) / window) - 1,
        floor(col(rightTs) / window),
        floor(col(rightTs) / window) + 1)))
    lB.join(rB, col("__lb") === col("__rb"), "inner")
      .where(abs(col(leftTs) - col(rightTs)) <= window)
      .drop("__lb", "__rb")
  }
}
