package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-shape profiling: the cheap audits run BEFORE committing a 100 TB
 * job to a plan — is this join key skewed enough to need salting
 * ([[graft.recon.Reconciler]]'s salted join) or AQE skew splitting?
 *
 * The reference has no profiling surface (reference: src/reconciliatior.py)
 * — LLM-pipeline extension.
 */
object Profiling {

  /**
   * Top-N heaviest key groups with their corpus share — the pre-join skew
   * audit. One map-side-combined count aggregation; the top-N runs as
   * TakeOrderedAndProject (per-partition heaps merged on the driver, N
   * rows), never a global sort and never a single-partition window; the
   * grand total is re-aggregated from the (already tiny) per-key counts,
   * and ReuseExchange dedups the shared groupBy, so the input is scanned
   * once. Ties beyond the cut break on the key columns — deterministic on
   * any layout.
   */
  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "keySkew: need at least one key column")
    require(topN > 0, s"keySkew: topN must be positive, got $topN")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__total").cast("double"))
      .drop("__total")
      .orderBy(col("n").desc +: keys.map(col): _*)
      .limit(topN)
  }
}
