package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyed snapshot diff — the CDC-shaped generalization of the
 * reference's two-ledger reconciliation (match / anti / anti,
 * reconciliatior.py's three outputs): given yesterday's and today's
 * snapshot of a keyed table, emit exactly what changed and how.
 *
 * One full-outer equi-join on the key, null-safe column compares for
 * the change classification — no hashing, so the classification is
 * engine-portable and per-column attributable. UNCHANGED rows are NOT
 * emitted: at 100 TB the unchanged mass dominates by orders of
 * magnitude and materializing it would make the diff cost as much as
 * rewriting the table; the output is change-sized, like a WAL segment.
 *
 * Output: key columns + `change_type` ('added'|'removed'|'changed') +
 * `n_cols_changed` (0 for added/removed — the row has no counterpart
 * to attribute columns against).
 *
 * Keys are primary-key-like: non-null and unique per snapshot
 * (presence of a side is detected via the first key column's
 * nullness after the outer join, which a null key would confound).
 */
object SnapshotDiff {

  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "no key columns")
    val cols = before.columns.toSeq
    require(after.columns.toSeq == cols,
      s"snapshot schemas differ: $cols vs ${after.columns.toSeq}")
    val valCols = cols.filterNot(keys.contains)
    val a = before.select(cols.map(c => col(c).as(s"__a_$c")): _*)
    val b = after.select(cols.map(c => col(c).as(s"__b_$c")): _*)
    val joinCond = keys.map(k => col(s"__a_$k") <=> col(s"__b_$k")).reduce(_ && _)
    val aKeyPresent = col(s"__a_${keys.head}").isNotNull
    val bKeyPresent = col(s"__b_${keys.head}").isNotNull
    val changedCols: Column =
      if (valCols.isEmpty) lit(0L)
      else valCols.map(c =>
        when(col(s"__a_$c") <=> col(s"__b_$c"), 0L).otherwise(1L)).reduce(_ + _)
    a.join(b, joinCond, "full_outer")
      .withColumn("change_type",
        when(!aKeyPresent, lit("added"))
          .when(!bKeyPresent, lit("removed"))
          .when(changedCols > 0, lit("changed")))
      .where(col("change_type").isNotNull)
      .withColumn("n_cols_changed",
        when(aKeyPresent && bKeyPresent, changedCols).otherwise(lit(0L)))
      .select(keys.map(k =>
        coalesce(col(s"__a_$k"), col(s"__b_$k")).as(k)) ++
        Seq(col("change_type"), col("n_cols_changed")): _*)
  }
}
