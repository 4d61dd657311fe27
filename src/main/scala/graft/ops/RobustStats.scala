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

  /**
   * Pearson correlation from EXACT integer moments: the five sums run
   * in DECIMAL(38,0) (associative — a float `corr()` differs across
   * engines on summation order alone), and the final coefficient is
   * one fixed-shape double expression over those exact integers.
   * Division and multiplication are IEEE-deterministic, and `sqrt` is
   * CORRECTLY ROUNDED by IEEE-754 (unlike ln/pow, which are
   * libm-specific — see [[Sketches]] on why hllCorrected is not
   * oracle-checked), so both engines produce the same bits. Inputs
   * must already be integral (cents/milli — the caller's scaling).
   * Null-complete rows only: pairs with either side null are excluded
   * from every moment (the standard pairwise-complete contract).
   */
  def corrExact(df: DataFrame, strataCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val y = col(yCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"), sum(x * x).as("sum_x2"), sum(y * y).as("sum_y2"))
      .select(col(strataCol), col("n"),
        col("sum_x").cast("string").as("sum_x"),
        col("sum_y").cast("string").as("sum_y"),
        col("sum_xy").cast("string").as("sum_xy"),
        col("sum_x2").cast("string").as("sum_x2"),
        col("sum_y2").cast("string").as("sum_y2"),
        // one fixed expression shape, doubles only at the very end
        ((col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double") /
          (sqrt((col("n") * col("sum_x2") - col("sum_x") * col("sum_x")).cast("double")) *
            sqrt((col("n") * col("sum_y2") - col("sum_y") * col("sum_y")).cast("double"))))
          .as("corr"))
  }

  /**
   * Least-squares trend slope from EXACT integer moments — the same
   * design as [[corrExact]] (DECIMAL(38,0) sums, one fixed-shape
   * double expression at the end; only division is floating, and it
   * is IEEE-deterministic). slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
   * in y-units per x-unit — the "is this metric drifting over time"
   * number a monitor thresholds on. Same pairwise-complete null
   * contract; a stratum with zero x-variance yields NaN (guarded —
   * ANSI mode would otherwise raise on the zero divisor), the
   * caller's signal that no trend is defined.
   */
  def slopeExact(df: DataFrame, strataCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val y = col(yCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"), sum(x * x).as("sum_x2"))
      .select(col(strataCol), col("n"),
        col("sum_x").cast("string").as("sum_x"),
        col("sum_y").cast("string").as("sum_y"),
        col("sum_xy").cast("string").as("sum_xy"),
        col("sum_x2").cast("string").as("sum_x2"),
        {
          val num = (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double")
          val den = (col("n") * col("sum_x2") - col("sum_x") * col("sum_x")).cast("double")
          when(den === 0.0d, lit(Double.NaN)).otherwise(num / den).as("slope")
        })
  }

  /**
   * Winsorization with fixed-memory thresholds: clip an integer column
   * to its per-stratum histogram-quantile EDGES — the tail-taming step
   * before any mean-based feature leaves a pipeline. Thresholds come
   * from [[Sketches.histBinCounts]] (≤ nBins counts per stratum on the
   * wire — the shape that survives a 100 TB column; an exact per-group
   * sort would shuffle every value), so each threshold is the integer
   * lower edge of the quantile's bin: `edge = lo + (bin·(hi−lo)) div
   * nBins`, with bin-width error by construction. The whole decision
   * path is integer arithmetic.
   *
   * Output: `strataCol, valueCol, clipped, clip_dir` (−1 clipped up
   * from below, 0 untouched, +1 clipped down from above).
   */
  def winsorize(df: DataFrame, strataCol: String, valueCol: String,
      nBins: Int, qLo: (Int, Int), qHi: (Int, Int)): DataFrame = {
    require(qLo._1 * qHi._2 < qHi._1 * qLo._2, s"qLo must be < qHi: $qLo, $qHi")
    val bounds = Sketches.histBounds(df, strataCol, valueCol)
    val counts = Sketches.histBinCounts(df, strataCol, valueCol, nBins, bounds)
    def edgeOf(q: (Int, Int), as: String) =
      Sketches.histQuantilesFromCounts(counts, bounds, strataCol, nBins, Seq(q))
        .select(col(strataCol), col("bin").as(as))
    val thresholds = bounds
      .join(edgeOf(qLo, "__blo"), Seq(strataCol))
      .join(edgeOf(qHi, "__bhi"), Seq(strataCol))
      .select(col(strataCol),
        (col("__lo") + expr(s"(__blo * (__hi - __lo)) div $nBins")).as("__elo"),
        (col("__lo") + expr(s"(__bhi * (__hi - __lo)) div $nBins")).as("__ehi"))
    df.select(col(strataCol), col(valueCol))
      .join(broadcast(thresholds), Seq(strataCol))
      .select(col(strataCol), col(valueCol),
        greatest(col("__elo"), least(col("__ehi"), col(valueCol))).as("clipped"),
        when(col(valueCol) < col("__elo"), -1L)
          .when(col(valueCol) > col("__ehi"), 1L).otherwise(0L).as("clip_dir"))
  }
}
