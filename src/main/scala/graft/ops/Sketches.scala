package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fixed-memory sketch operators. At the 100 TB tier a plain
 * `count(DISTINCT token)` shuffles every distinct value; a HyperLogLog
 * register set shuffles at most `m` small integers per stratum no matter
 * how many distinct values exist — the shuffle payload is bounded by the
 * sketch, not the data.
 *
 * This HLL is deliberately NOT `approx_count_distinct`: Spark's built-in
 * uses an engine-private hash/dense-encoding, so its output can never be
 * value-checked against another engine. Ours is built from the portable
 * 60-bit md5 key hash ([[Sampling.keyHash]]) and plain integer/bit
 * arithmetic, so DuckDB reproduces every register — and therefore the
 * estimate — bit for bit (see `SketchSql.hllSql`).
 *
 * Layout (p = 6, m = 64 registers): for each value,
 * `h = keyHash(value)` (60 bits), `bucket = h % m` (low p bits),
 * `rest = h >> p` (54 bits), `rho = 55 - bitlen(rest)` (leading-zero
 * rank in the 54-bit field, 55 when rest = 0). The register is
 * `M_j = max(rho)` per bucket — idempotent, so duplicate values need no
 * pre-DISTINCT and partial aggregation combines map-side.
 *
 * The harmonic sum is kept EXACT: `S = Σ_j 2^(55 - M_j)` is an integer
 * (M_j ≤ 55; empty registers contribute 2^55; max S = 64·2^55 = 2^61,
 * no overflow), so the only float op is one literal-by-integer division
 * — bit-identical across IEEE-754 engines. The small-range (linear
 * counting) correction needs `ln`, whose last ulp is libm-specific, so
 * the correction lives in [[hllCorrected]] for callers and specs; the
 * oracle-checked surface is registers + exact scaled sum + raw estimate.
 */
object Sketches {

  /** register-count exponent: m = 2^P registers per stratum. */
  final val P = 6
  final val M = 1 << P // 64
  /** bits in the rho field: 60-bit hash minus P bucket bits. */
  final val RestBits = 60 - P // 54

  /** alpha_m · m² · 2^55 — the HLL bias constant pre-multiplied so the
    * estimate is one division; computed on the driver and embedded as
    * the same literal in both engines. */
  val EstimateNumerator: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    alpha * M * M * math.pow(2.0, 55)
  }

  /** Per-(stratum, bucket) max-rho registers. Only non-empty buckets
    * appear; [[hllEstimate]] accounts for the missing ones exactly. */
  def hllRegisters(df: DataFrame, strataCol: String, valueCol: Column): DataFrame = {
    val h = Sampling.keyHash(valueCol)
    val rest = shiftright(h, P)
    // bitlen via bin(): both engines' bin() render the minimal binary
    // string, so rho needs no log2 (whose float error would be fatal here)
    val rho = when(rest === 0, lit(55))
      .otherwise(lit(55) - length(bin(rest)))
    df.select(col(strataCol), (h % M).cast("int").as("bucket"), rho.as("rho"))
      .groupBy(col(strataCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /**
   * One row per stratum: `(strata, n_zero_registers, s_scaled,
   * raw_estimate)`. `s_scaled` is the exact integer harmonic sum
   * Σ 2^(55 - M_j); `raw_estimate = EstimateNumerator / s_scaled` is the
   * uncorrected HLL estimate. All three are cross-engine exact.
   */
  def hllEstimate(df: DataFrame, strataCol: String, valueCol: Column): DataFrame =
    hllRegisters(df, strataCol, valueCol)
      .groupBy(col(strataCol))
      .agg(
        (lit(M) - count(lit(1))).as("n_zero_registers"),
        // shift amount is a column, which the Scala shiftleft API can't
        // express — the SQL form ShiftLeft(col, col) can
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - rho)")) +
          (lit(M) - count(lit(1))) * lit(1L << 55)).as("s_scaled"))
      .select(col(strataCol), col("n_zero_registers"), col("s_scaled"),
        (lit(EstimateNumerator) / col("s_scaled").cast("double")).as("raw_estimate"))

  /** Standard small-range correction (linear counting when the raw
    * estimate is under 2.5·m and empty registers remain). Uses `ln`, so
    * it is spec-tested (error bound vs exact distinct) rather than
    * hash-checked. */
  def hllCorrected(df: DataFrame, strataCol: String, valueCol: Column): DataFrame =
    hllEstimate(df, strataCol, valueCol)
      .withColumn("estimate",
        when(col("raw_estimate") <= 2.5 * M && col("n_zero_registers") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("n_zero_registers").cast("double")))
          .otherwise(col("raw_estimate")))
}
