package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed Poisson bootstrap (Chamandy et al., Google 2012 — "the
 * bag of little bootstraps'" sibling for map-reduce): instead of
 * resampling n rows WITH replacement B times (which needs global
 * coordination per replicate), each row independently contributes a
 * Poisson(1)-distributed weight to every replicate. For large n the
 * multinomial resample and the Poisson weighting are indistinguishable,
 * and the Poisson form is embarrassingly parallel: one pass over the
 * data, map-side partial aggregation collapses the row×replicate
 * explosion to |strata|·B partial sums before anything shuffles.
 *
 * Determinism across engines: the weight is a pure function of the
 * row's key and the replicate index — the 60-bit md5 hash mapped
 * through the Poisson(1) CDF with thresholds pre-scaled to exact
 * 2^60-denominator integer literals (computed once, hardcoded below,
 * mirrored verbatim in the DuckDB oracle). No RNG state, no
 * partition-order dependence; re-runs and both engines produce
 * identical replicates bit for bit.
 *
 * All statistics are exact integers: replicate means in milli-cents
 * via `(1000·Σ w·cents) div (Σ w)` (callers guarantee non-negative
 * cents — truncating `div` ≡ DuckDB `//` only off negatives), CI
 * bounds as order statistics of the B replicate means (rank picked by
 * `row_number` over a per-stratum window of exactly B rows — bounded,
 * never data-sized).
 */
object Bootstrap {

  /** Poisson(1) CDF thresholds scaled by 2^60: `floor(P(X ≤ k)·2^60)`
    * for k = 0..6; a 60-bit hash below `Cdf60(k)` means weight ≤ k.
    * Mass beyond 6 (≈8.3e-5) gets weight 7 — the tail's conditional
    * mean is ~7.1, so capping biases a replicate sum by < 1e-5. */
  private val Cdf60: Seq[Long] = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L)

  /** 60-bit md5 of `key || ':' || b` — ≡ DuckDB
    * `('0x' || substr(md5(k || ':' || b), 1, 15))::BIGINT`. */
  private def hash60(key: Column, b: Column): Column =
    conv(substring(md5(concat(key, lit(":"), b.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic Poisson(1) weight (0..7) for (row key, replicate). */
  def poissonWeight(key: Column, b: Column): Column = {
    val h = hash60(key, b)
    Cdf60.zipWithIndex.foldRight(lit(7L): Column) { case ((t, k), rest) =>
      when(h < lit(t), lit(k.toLong)).otherwise(rest)
    }
  }

  /**
   * Per-stratum bootstrap confidence interval for the mean of a
   * non-negative integer measure (cents), plus the full-sample point
   * estimate. Output: `(stratum, n_rows, mean_mc, ci_lo_mc, ci_hi_mc)`
   * — milli-cent BIGINTs. `loRank`/`hiRank` are 1-based order
   * statistics over the `nBoot` replicate means (e.g. 3 and 46 of 48
   * ≈ a 90% percentile interval). Cost: rows×`nBoot` expansion that
   * partial-aggregates within the scan stage; the only shuffles are
   * |strata|·`nBoot`-row aggregates and a window over B rows per
   * stratum.
   */
  def meanCi(df: DataFrame, stratum: Column, cents: Column, key: Column,
      nBoot: Int, loRank: Int, hiRank: Int): DataFrame = {
    require(nBoot > 0 && loRank >= 1 && hiRank <= nBoot && loRank <= hiRank,
      s"need 1 <= loRank <= hiRank <= nBoot; got ($loRank, $hiRank, $nBoot)")
    val rows = df.select(stratum.as("stratum"), cents.as("cents"),
      key.cast("string").as("k"))
    // the ×nBoot hash explosion must not inherit the scan's partitioning
    // (a small input is often ONE split — the whole md5 fan-out would run
    // on a single core, and AQE would coalesce a size-based repartition
    // right back because it can't see the ×nBoot expansion downstream);
    // an explicit partition count is exempt from AQE coalescing. At real
    // scale the scan has thousands of splits and this is just a rebalance
    val spreadN = df.sparkSession.sparkContext.defaultParallelism
    val reps = rows.repartition(spreadN, col("k"))
      .withColumn("b", explode(sequence(lit(0), lit(nBoot - 1))))
      .withColumn("w", poissonWeight(col("k"), col("b")))
      .groupBy(col("stratum"), col("b"))
      .agg(sum(col("w") * col("cents")).as("s"), sum(col("w")).as("n"))
      .withColumn("mean_mc",
        when(col("n") > 0, expr("(1000 * s) div n")).cast("long"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("mean_mc").asc_nulls_first, col("b"))
    val ci = reps.withColumn("rn", row_number().over(w))
      .where(col("rn") === loRank || col("rn") === hiRank)
      .groupBy(col("stratum"))
      .agg(min(when(col("rn") === loRank, col("mean_mc"))).as("ci_lo_mc"),
        max(when(col("rn") === hiRank, col("mean_mc"))).as("ci_hi_mc"))
    val point = rows.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sc"))
      .withColumn("mean_mc", expr("(1000 * sc) div n_rows").cast("long"))
      .drop("sc")
    point.join(ci, Seq("stratum"))
  }
}
