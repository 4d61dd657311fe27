package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-group top-k selection — the "best k documents per domain / language /
 * source" primitive every curation pipeline ends with (pick the k
 * highest-quality docs per bucket, the k most recent events per user, …).
 *
 * Scale shape: ONE hash shuffle on the group key, then a per-partition
 * sort feeding a streaming `row_number` — no global sort, no per-group
 * collect. Each group must land on one partition (the window contract),
 * but `row_number`'s state is O(1) and the sort spills, so a skewed giant
 * group degrades to disk sort, never to OOM. The rank filter cuts the
 * output to k·|groups| rows before anything downstream runs.
 *
 * The reference has no ranking surface (reference: src/reconciliatior.py
 * sorts whole frames only) — LLM-pipeline extension.
 */
object Ranking {

  /**
   * Keep the top `k` rows of every group, ranked by `order` (pass explicit
   * ties-breaking columns — `row_number` is deterministic only for a total
   * order). Output carries a 1-based `rankCol`.
   */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rankCol: String = "rank"): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup: need at least one group column")
    require(k > 0, s"topKPerGroup: k must be positive, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }

  /**
   * Exact per-stratum CDF transform in milli-units — the
   * distribution-free feature normalization ("this doc is in the 87th
   * percentile of its language's length"): `cdf_milli = 1000·rank div
   * n` with `rank` the TIE-AWARE max rank (every row of a tie class
   * gets the class's upper CDF value, so equal inputs get equal
   * features — a row_number would split ties by arbitrary order). The
   * rank window partitions per stratum (bounded by stratum size; for a
   * single billion-row stratum use [[graft.ops.Sketches.histQuantiles]]
   * instead).
   */
  def cdfMilli(df: DataFrame, strataCol: String, valueCol: String): DataFrame = {
    val byV = Window.partitionBy(col(strataCol)).orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(strataCol))
    df.select(col(strataCol), col(valueCol))
      .withColumn("__rk", count(lit(1)).over(byV))
      .withColumn("__n", count(lit(1)).over(whole))
      .select(col(strataCol), col(valueCol),
        expr("(__rk * 1000) div __n").as("cdf_milli"))
  }
}
