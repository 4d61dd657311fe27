package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Outlier-robust location/spread statistics from EXACT order
 * statistics — the median/MAD pair telemetry pipelines use where one
 * fat-finger event would drag a mean/stddev arbitrarily far (the
 * breakdown point of the median is 50%; of the mean, one row).
 *
 * Exactness: the median is carried DOUBLED (`2·median` = the sum of
 * the two middle order statistics; for odd counts, twice the middle)
 * so even-count midpoints never divide — every emitted number is an
 * exact integer when the input is, and Spark and DuckDB agree bit for
 * bit. MAD composes the same primitive over absolute deviations from
 * the doubled median, landing at `4·MAD`.
 *
 * Scale shape: one rank window and one count window, both PARTITIONED
 * BY the group column (bounded by group size, never a whole-input
 * funnel), then a group aggregate. Groups are assumed numerous and
 * bounded (per-type, per-tenant, per-day) — a single billion-row group
 * would need a sketch-based quantile instead (see
 * [[Sketches.histQuantiles]]).
 */
object RobustStats {

  /**
   * Per-group doubled median of `vCol` (long-typed): output
   * `(groupCol, n, med_x2)` where `med_x2 = 2·median` exactly.
   */
  def medianX2(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
    val cw = Window.partitionBy(col(groupCol))
    df.withColumn("__rs_rn", row_number().over(w))
      .withColumn("__rs_n", count(lit(1)).over(cw))
      .groupBy(col(groupCol))
      .agg(max(col("__rs_n")).as("n"),
        // the two middle ranks coincide for odd n: that row sums once
        // and the ×2 restores the doubling. div, not /: Column./ on
        // longs is DOUBLE division
        (sum(when(col("__rs_rn") === expr("(__rs_n + 1) div 2") ||
          col("__rs_rn") === expr("(__rs_n + 2) div 2"), col(vCol)))
          * when(max(col("__rs_n")) % 2 === 1, 2).otherwise(1)).as("med_x2"))
  }

  /**
   * Per-group robust location + spread: `(groupCol, n, med_x2, mad_x4)`
   * — doubled median and quadrupled median-absolute-deviation, both
   * exact integers for integer input.
   */
  def medianMad(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val m = medianX2(df, groupCol, vCol)
    val dev = df.join(m.select(col(groupCol), col("med_x2")), Seq(groupCol))
      .select(col(groupCol),
        abs(lit(2) * col(vCol) - col("med_x2")).as("__rs_dev2"))
    val mad = medianX2(dev, groupCol, "__rs_dev2")
      .select(col(groupCol), col("med_x2").as("mad_x4"))
    m.join(mad, Seq(groupCol))
  }
}
