package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Time-series regularization: an irregular event stream becomes a
 * fixed-interval grid per entity — the feature-engineering step before
 * any sequence model, forecasting job, or rate alarm ("events per hour
 * per user, with the silent hours PRESENT as zeros, not absent").
 *
 * Two stages, both distributed:
 *  1. bucket + aggregate: one shuffle on (entity, bucket) with
 *     map-side combine; sums in DECIMAL(38,9) (associative — see
 *     [[IncrementalAgg]]).
 *  2. gap fill: each entity's [min, max] bucket span is generated
 *     in-plan (`sequence` + `explode` off a per-entity bounds row — the
 *     generator is entity-local, no driver loop, no cross join) and
 *     left-joined back; missing buckets surface with `n_events = 0`,
 *     `filled = 1`, and a last-observation-carried-forward sum.
 *
 * The LOCF window is partitioned per entity and ordered by bucket —
 * bounded by an entity's bucket span, never data-global. Dense-span
 * caveat at 100 TB: the grid is Σ per-entity spans rows; pick the
 * interval so that stays O(input), which is also what makes the grid
 * useful (a grid 100× the event count is a modeling smell, not an
 * engine limit).
 */
object Resample {

  /** Stage 1: per-(entity, bucket) count and exact decimal sum.
    * `bucket = floor(unix_millis(ts) / intervalMs)`. */
  def resample(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, intervalMs: Long): DataFrame = {
    require(intervalMs >= 1L, s"intervalMs must be >= 1: $intervalMs")
    df.groupBy(col(entityCol),
        expr(s"unix_millis($tsCol) div ${intervalMs}L").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(38, 9))).as("sum_val"))
  }

  /** Stage 2: close the gaps of a [[resample]] frame. Output adds
    * `filled` (1 = generated row, 0 = observed) and `locf_sum` (the
    * last observed `sum_val` at or before this bucket). */
  def gapFill(resampled: DataFrame, entityCol: String): DataFrame = {
    val bounds = resampled.groupBy(col(entityCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
    val grid = bounds.select(col(entityCol),
      explode(sequence(col("__mn"), col("__mx"))).as("bucket"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(resampled, Seq(entityCol, "bucket"), "left")
      .select(col(entityCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_val"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("filled"),
        last(col("sum_val"), ignoreNulls = true).over(w).as("locf_sum"))
  }

  /** The composed operator: bucket, aggregate, gap-fill, LOCF. */
  def regularize(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, intervalMs: Long): DataFrame =
    gapFill(resample(df, entityCol, tsCol, valueCol, intervalMs), entityCol)

  /**
   * Time-weighted mean (TWAP): each observation's value holds until the
   * entity's NEXT observation (LOCF semantics over continuous time), the
   * last one until the stream's global max timestamp — so a price that sat
   * at 100 for six hours and spiked to 500 for one minute averages ~100,
   * where a row-mean would report 300. The metric that matters whenever
   * sampling is event-driven rather than clocked.
   *
   * Exactness: durations are exact epoch-microsecond differences, the
   * value must already be integral (caller's cents/milli scaling), and the
   * duration-weighted numerator runs in DECIMAL(38,0) (cents × micros
   * exceeds int64 headroom at realistic spans). The result is
   * `twap_mc = (1000·Σ value·dur) div Σ dur` — milli-units of the input
   * scale, exact integer in any engine. All inputs are non-negative by
   * contract (`div` truncation ≡ floor), enforced with a runtime check.
   *
   * Scale: one window per entity (lead), one aggregate shuffle; the global
   * horizon is a 1-row aggregate broadcast in-plan — no driver collect.
   * Entities with all events at the horizon instant have span 0 and a
   * null twap (guarded — ANSI would raise on the division).
   */
  def timeWeightedMean(df: DataFrame, entityCol: String, tsCol: String,
      valueInt: Column, tieCol: String): DataFrame = {
    val t = unix_micros(col(tsCol))
    val horizon = df.agg(max(unix_micros(col(tsCol))).as("__hz"))
    val w = Window.partitionBy(col(entityCol)).orderBy(t, col(tieCol))
    val timed = df
      .withColumn("__v", when(valueInt < 0,
        raise_error(lit("timeWeightedMean: negative value"))).otherwise(valueInt))
      .withColumn("__t", t)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .withColumn("__dur", coalesce(col("__next"), col("__hz")) - col("__t"))
    timed.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__dur")).as("span_us"),
        sum((col("__v") * col("__dur")).cast(DecimalType(38, 0))).as("__num"))
      .select(col(entityCol), col("n_events"), col("span_us"),
        when(col("span_us") > 0,
          expr("(1000 * __num) div span_us")).cast("long").as("twap_mc"))
  }
}
