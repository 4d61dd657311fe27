package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for every left row, the most recent right row with
 * `rightTs <= leftTs` per key (the time-series point-in-time lookup).
 *
 * Spark has no native as-of operator; per the build contract's
 * preference order this COMPOSES existing ones instead of adding a
 * custom plan node: tag both sides, union them, and take a
 * last-non-null window over (ts, side, tiebreak) per key. One shuffle
 * on the key (the window), each partition sorted once — same cost
 * profile as a sort-merge join, no custom Strategy to maintain, and the
 * scale story is the window's: keys partition independently, so it
 * survives 100× as long as no single key dominates (salt upstream if
 * one does).
 *
 * Rows with no prior right row get nulls. `tiebreak` is a RIGHT-side
 * expression that must totally order right rows within (key, ts) for a
 * deterministic pick (the largest wins at equal ts); left rows never
 * compete with each other, so they need none. Right rows at
 * ts == leftTs are visible to the left row (inclusive as-of).
 *
 * @param valueCols right-side columns to surface, prefixed `asof_`
 */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tiebreak: Column): DataFrame = {
    val rv = struct(valueCols.map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), rv.as("__rv"),
        lit(0).as("__side"), tiebreak.as("__tb")): _*)
    val rvType = rTagged.schema("__rv").dataType.asInstanceOf[StructType]
    val tbType = rTagged.schema("__tb").dataType
    val lRow = struct(left.columns.map(col).toIndexedSeq: _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(null).cast(rvType).as("__rv"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"), lRow.as("__lrow")): _*)
    val u = rTagged
      .withColumn("__lrow", lit(null).cast(lTagged.schema("__lrow").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lrow.*") +:
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /**
   * Forward as-of: for every left row, the EARLIEST right row with
   * `rightTs >= leftTs` per key — the "next event" lookup (time to
   * next purchase, next maintenance slot, next quote). Mirror of
   * [[asOf]]: sides swap order at equal ts (left first, so a right
   * row at the same instant is visible — inclusive), the frame looks
   * FORWARD, and at equal (ts) the SMALLEST `tiebreak` wins. Same
   * one-shuffle window cost; rows with no following right row get
   * nulls.
   */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tiebreak: Column): DataFrame = {
    val rv = struct(valueCols.map(col): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), rv.as("__rv"),
        lit(1).as("__side"), tiebreak.as("__tb")): _*)
    val rvType = rTagged.schema("__rv").dataType.asInstanceOf[StructType]
    val tbType = rTagged.schema("__tb").dataType
    val lRow = struct(left.columns.map(col).toIndexedSeq: _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(null).cast(rvType).as("__rv"), lit(0).as("__side"),
        lit(null).cast(tbType).as("__tb"), lRow.as("__lrow")): _*)
    val u = rTagged
      .withColumn("__lrow", lit(null).cast(lTagged.schema("__lrow").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__asof", first(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(col("__lrow.*") +:
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
