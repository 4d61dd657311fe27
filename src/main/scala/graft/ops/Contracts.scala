package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data contracts: declarative validation checks over a table, evaluated
 * as ONE aggregation pass and reported as a machine-readable table —
 * the dbt-test / Great-Expectations shape, re-expressed as columnar
 * aggregates so a 100 TB table pays a single scan for its whole check
 * suite instead of one job per check.
 *
 * Each check contributes a violation-count expression; the report row
 * is `(check_name, n_violations, pass)` with `pass = (n_violations =
 * 0)` as an exact integer flag. Checks that need a second table
 * (referential integrity) or a self-grouping (uniqueness) run as their
 * own aggregate and union into the report — still one scan per
 * DISTINCT input, never per check.
 */
object Contracts {

  /** A named row-level predicate: rows violating `ok` count against the
    * contract. */
  final case class Check(name: String, ok: Column)

  /** Row-level checks evaluated in one scan: each check becomes one
    * conditional-sum aggregate over the same pass. */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    // names are interpolated into a selectExpr below — reject anything
    // that could break out of the string/backtick quoting at the call
    // site instead of as a parse error deep inside Catalyst
    checks.foreach { c =>
      require(c.name.matches("[A-Za-z0-9_ .-]+"),
        s"check name must match [A-Za-z0-9_ .-]+: '${c.name}'")
    }
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    val aggs = checks.map(c =>
      sum(when(!coalesce(c.ok, lit(false)), 1L).otherwise(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one wide row -> long report: stack is a plain projection, no shuffle
    val stacked = checks.map(c =>
      s"'${c.name}', coalesce(`${c.name}`, 0L)").mkString(", ")
    wide.selectExpr(s"stack(${checks.length}, $stacked) as (check_name, n_violations)")
      .withColumn("pass", (col("n_violations") === 0L).cast("long"))
  }

  /** Uniqueness contract: no duplicate `keys` tuple. Violations = extra
    * rows beyond the first of each duplicated tuple (so a clean table
    * reports 0, a fully-doubled table reports n/2). */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("pass"))

  /** Referential-integrity contract: every non-null `fkCol` value of
    * `df` exists as `pkCol` in `dim`. Violations = orphan ROWS. The
    * check is a left-anti join on the key — broadcast when `dim` is a
    * dimension, shuffle-partitioned like any equi-join otherwise. */
  def referenceCheck(df: DataFrame, name: String, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame =
    df.where(col(fkCol).isNotNull)
      .join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("pass"))

  /**
   * Functional-dependency audit: how strongly does the `lhs` tuple
   * determine `rhs`? Violations count rows outside each lhs value's
   * MODAL rhs (the minimum row repairs to make the FD hold — the
   * standard g3 error measure, Kivinen & Mannila 1995). Two grouped
   * counts, both map-side combinable: (lhs, rhs) pair counts, then a
   * per-lhs max — nothing data-sized survives the first shuffle. One
   * summary row: `(fd_name, n_rows, n_lhs, n_violating_lhs,
   * n_violations, g3_milli)`.
   */
  def fdAudit(df: DataFrame, name: String, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "no lhs columns")
    val pairs = df.groupBy((lhs :+ rhs).map(col): _*).agg(count(lit(1)).as("__n"))
    val perLhs = pairs.groupBy(lhs.map(col): _*)
      .agg(sum(col("__n")).as("__rows"), max(col("__n")).as("__modal"),
        count(lit(1)).as("__nrhs"))
    perLhs.agg(
        coalesce(sum(col("__rows")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        coalesce(sum(when(col("__nrhs") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_lhs"),
        coalesce(sum(col("__rows") - col("__modal")), lit(0L)).as("n_violations"))
      .select(lit(name).as("fd_name"), col("n_rows"), col("n_lhs"),
        col("n_violating_lhs"), col("n_violations"),
        when(col("n_rows") === 0, 0L)
          .otherwise(expr("(n_violations * 1000) div n_rows")).as("g3_milli"))
  }

  /** Assemble a full report: row checks in one scan plus any number of
    * table-level check frames, unioned into one
    * `(check_name, n_violations, pass)` table. */
  def report(df: DataFrame, checks: Seq[Check], extra: Seq[DataFrame] = Seq.empty): DataFrame =
    extra.foldLeft(rowChecks(df, checks))(_ unionByName _)

  /**
   * Referential-integrity audit of one FK edge: how many child rows
   * point at a parent key that does not exist (orphans), how many carry
   * a null key (excused from the orphan count — nullability is its own
   * contract). One anti-join on the key (Spark broadcasts the parent
   * key set when small; at 100 TB both sides hash-shuffle on the key,
   * which is the right plan); the parent side is deduplicated first so
   * a parent-side duplicate cannot double-count a child. Union several
   * edges into the star-schema integrity report.
   */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, edge: String): DataFrame = {
    val totals = child.agg(count(lit(1)).as("n_child"),
      // coalesce: sum over an EMPTY child is null, and the report's
      // contract is zeros-with-null-rate, not a nullable count
      coalesce(sum(when(col(childKey).isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_key"))
    val orphans = child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphans)
      .select(lit(edge).as("edge"), col("n_child"), col("n_null_key"),
        col("n_orphans"),
        when(col("n_child") > 0,
          expr("(1000 * n_orphans) div n_child")).as("orphan_milli"))
  }
}
