package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators. At the 100 TB tier the dominant cost is what a
 * scan does NOT have to read: range-partitioning the corpus by a
 * space-filling curve over two filter dimensions keeps rows that are
 * close in BOTH dimensions in the same files, so min/max footer stats
 * prune most files for 2-D range predicates — the same reason Delta/
 * Iceberg expose OPTIMIZE ZORDER BY (re-derived here from the Morton
 * construction; nothing is copied).
 *
 * The z-value is pure bit arithmetic over codegen'd built-ins (no UDF),
 * and the DuckDB oracle reproduces it term for term via
 * [[Layout.zValue2Sql]].
 */
object Layout {

  /**
   * Morton (z-order) interleave of the low `bits` bits of two
   * non-negative columns: `x` occupies even bit positions, `y` odd.
   * Callers clip/scale their dimensions into `bits` first (e.g.
   * `pmod(key, 1 << bits)`).
   */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB mirror of [[zValue2]]: the same `bits` interleave terms,
    * OR-folded, generated from the same loop. */
  def zValue2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")

  /**
   * Cluster a frame for 2-D locality: range-partition on the z-value,
   * sort within partitions by it. Writing the result gives files whose
   * footer min/max on BOTH source dimensions are tight — the scan-time
   * pruning this layout exists for. The range exchange samples the
   * z-values (one extra pass), which is the intended trade: a one-time
   * layout cost against every future scan of the table.
   */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int,
      nPartitions: Int): DataFrame =
    df.withColumn("__z", zValue2(x, y, bits))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
