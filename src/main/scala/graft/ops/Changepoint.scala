package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Offline changepoint detection by the max-|CUSUM| statistic (Page
 * 1954's cumulative-sum idea in its offline form — the first split of
 * binary segmentation): for a per-series sequence of counts x_1..x_n,
 * the candidate changepoint is the index where the cumulative
 * deviation from the series mean peaks in absolute value. The alarm a
 * pipeline wants over ingest volumes: "this source's hourly document
 * rate shifted regime at bucket B".
 *
 * Integer-exact: deviations are scaled by n (`dev_i = x_i·n − total`,
 * i.e. (x_i − mean)·n with the division eliminated), so CUSUM is a sum
 * of longs both engines compute bit-identically. Overflow headroom:
 * |dev| ≤ total, so |cusum| ≤ n·total — at 10^6 buckets × 10^12 events
 * that's 10^18, inside int64; beyond that, pre-aggregate to coarser
 * buckets (which such a series needs anyway).
 *
 * Scale shape: input is the BUCKETED series (one row per (series,
 * bucket) — build it with [[Resample]], gap-filled so silent buckets
 * weigh in as zeros), never raw events; windows are series-partitioned
 * and bucket-count-sized. Totals ride a broadcast join back.
 */
object Changepoint {

  /**
   * Pettitt's nonparametric changepoint (Pettitt 1979) — the RANK-based
   * companion to [[maxCusum]]: where CUSUM reacts to mean shifts and one
   * fat-finger outlier can drag it, the Pettitt statistic
   * U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i) is a prefix-vs-suffix
   * Mann–Whitney comparison — distribution-free, outlier-bounded (every
   * pair contributes ±1 at most), the standard hydrology/climatology
   * regime test.
   *
   * The naive form is O(n²) pairs; this uses the exact identity
   *   U_t = Σ_{i≤t} (n + 1 − 2·avgrank(x_i))
   * (within-prefix pairs cancel by antisymmetry), which is one rank
   * pass + one prefix sum — O(n log n), series-partitioned windows
   * only. Tie handling is mid-rank; everything is kept integral by
   * DOUBLING: avgrank = (2·minrank + ties − 1)/2, so
   * u_doubled_t = Σ (2n + 2 − 2·(2·minrank + ties − 1))/…  — all longs,
   * bit-identical in both engines.
   *
   * Output one row per series: the bucket where |U| peaks (ties → the
   * earliest bucket), the doubled statistic there, and n.
   */
  def pettitt(df: DataFrame, seriesCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val nW = Window.partitionBy(col(seriesCol))
    val rankW = nW.orderBy(col(valueCol))
    val tieW = Window.partitionBy(col(seriesCol), col(valueCol))
    val cumW = nW.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pickW = nW.orderBy(abs(col("u_doubled")).desc, col(orderCol))
    df.withColumn("__n", count(lit(1)).over(nW))
      .withColumn("__r2",
        lit(2L) * rank().over(rankW) + count(lit(1)).over(tieW) - lit(1L))
      .withColumn("__term", lit(2L) * col("__n") + lit(2L) - lit(2L) * col("__r2"))
      .withColumn("u_doubled", sum(col("__term")).over(cumW))
      .withColumn("__rk", row_number().over(pickW))
      .where(col("__rk") === 1)
      .select(col(seriesCol), col(orderCol).as("cp_bucket"),
        col("u_doubled"), col("__n").as("n_points"))
  }

  /** One row per series: the bucket where |CUSUM| peaks (ties → the
    * earliest bucket), with the peak value and the series' n/total for
    * interpretation. `valueCol` must be integral. */
  def maxCusum(df: DataFrame, seriesCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val totals = df.groupBy(col(seriesCol))
      .agg(sum(col(valueCol)).as("__tot"), count(lit(1)).as("__n"))
    val cumW = Window.partitionBy(col(seriesCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pickW = Window.partitionBy(col(seriesCol))
      .orderBy(abs(col("cusum_scaled")).desc, col(orderCol))
    df.join(broadcast(totals), seriesCol)
      .withColumn("__dev", col(valueCol).cast("long") * col("__n") - col("__tot"))
      .withColumn("cusum_scaled", sum(col("__dev")).over(cumW))
      .withColumn("__rk", row_number().over(pickW))
      .where(col("__rk") === 1)
      .select(col(seriesCol), col(orderCol).as("cp_bucket"),
        col("cusum_scaled"), col("__n").as("n_points"), col("__tot").as("total"))
  }
}
