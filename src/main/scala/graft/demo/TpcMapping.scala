package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.recon._

/**
 * Maps the driver's TPC-H-ish testdata onto the reconciliation data model
 * (FIXTURES.md §5): `orders` plays the internal "ODL" ledger; a
 * deterministically-perturbed projection of `orders` plays the external
 * settlement file. Every derivation here has an exact ANSI-SQL mirror in
 * [[OracleSql]] so the DuckDB oracle reproduces it bit-for-bit:
 *  - o_orderkey % 10 <= 6  → present in both sides, keys equal (exact match)
 *  - o_orderkey % 10 ∈ {7,8} → external amount = o_totalprice + 0.05
 *                              (tolerance-pass candidates, diff 0.05)
 *  - o_orderkey % 10 == 9  → internal-only (internal remanents)
 *  - o_orderkey % 7 == 0   → extra external-only rows with shifted keys
 *                              (external remanents)
 *
 * IEEE-754 double arithmetic (`+ 0.05`) and long/STRING casts are
 * deterministic and identical across Spark and DuckDB, so join keys agree.
 */
object TpcMapping {

  /** The reconciliation spec for the demo mapping: 4 keys — string, double,
    * long, string — echoing the reference's RC_KEYS shape
    * (1 double + 1 int64 + 4 strings, reference src/config.py:10-21). */
  val conf: ReconConfig = ReconConfig(
    keys = Seq(
      KeyPair("ext_code", "transaction_code"),
      KeyPair("ext_amount", "approved_transaction_amount"),
      KeyPair("ext_ts", "create_timestamp"),
      KeyPair("ext_prio", "bin_code")),
    types = FieldTypes(
      longFields = Set("create_timestamp"),
      doubleFields = Set("approved_transaction_amount")),
    idField = "_id",
    externalId = "ext_id",
    orderField = "ext_row",
    tolerance = Some(ToleranceRule(KeyPair("ext_amount", "approved_transaction_amount"), 0.1d)),
    // two-column rule like the reference's [ticket_code,
    // approved_transaction_amount] pairing (reconciliatior.py:169-171);
    // the demo's second column is the banded amount so the fixture data
    // actually produces cancelling pairs (raw doubles never collide)
    zeroEffect = Some(ZeroEffectRule(
      kindField = "transaction_type", saleKind = "O", voidKind = "F",
      saleCols = Seq("ticket_code", "amount_band"),
      voidCols = Seq("sale_ticket_code", "amount_band"))))

  val audit: AuditSpec = AuditSpec(
    executionId = "exec-0001",
    executionDate = "2026-01-01",
    executionTimestamp = 1767225600000L,
    externalSourceName = "tpc_external")

  /** Internal "a" side (reference ODL schema, FIXTURES.md §2). */
  def internal(spark: SparkSession, dir: String): DataFrame =
    internalFrom(spark.read.parquet(s"$dir/orders.parquet"))

  /**
   * Internal side restricted to an epoch-ms window, with the predicate
   * expressed on the *source* timestamp column so it reaches the parquet
   * scan (PushedFilters) — filtering the derived `create_timestamp`
   * (unix_millis of a cast) is not invertible for pushdown. Equivalent
   * because o_orderdate ↔ epoch-ms is a monotone bijection at ms precision.
   */
  def internalInWindow(spark: SparkSession, dir: String, fromMs: Long, toMs: Long): DataFrame = {
    def ntz(ms: Long) = lit(java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC))
    internalFrom(
      spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderdate") >= ntz(fromMs) && col("o_orderdate") < ntz(toMs)))
  }

  private def internalFrom(o: DataFrame): DataFrame = o.select(
    col("o_orderkey").cast("string").as("_id"),
    col("o_orderkey").cast("string").as("transaction_code"),
    col("o_totalprice").as("approved_transaction_amount"),
    unix_millis(col("o_orderdate").cast("timestamp")).as("create_timestamp"),
    col("o_orderstatus").as("transaction_type"),
    col("o_custkey").cast("string").as("ticket_code"),
    col("o_custkey").cast("string").as("sale_ticket_code"),
    col("o_orderpriority").as("bin_code"),
    floor(col("o_totalprice") / 10000).cast("long").as("amount_band"),
    col("o_orderkey").as("row_order"))

  /** External "b" side (reference settlement CSV after prep, FIXTURES.md §1). */
  def external(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    def base(amount: org.apache.spark.sql.Column, idShift: Long) = o.select(
      (col("o_orderkey") + lit(idShift)).cast("string").as("ext_id"),
      (col("o_orderkey") + lit(idShift)).cast("string").as("ext_code"),
      amount.as("ext_amount"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ext_ts"),
      col("o_orderpriority").as("ext_prio"),
      (col("o_orderkey") + lit(idShift)).as("ext_row"))
    val exact = base(col("o_totalprice"), 0L).where(col("ext_row") % 10 <= 6)
    val tol   = base(col("o_totalprice") + lit(0.05d), 0L).where(col("ext_row") % 10 >= 7 && col("ext_row") % 10 <= 8)
    val extra = base(col("o_totalprice"), 10000000L).where((col("ext_row") - 10000000L) % 7 === 0)
    exact.unionByName(tol).unionByName(extra)
  }

  /**
   * External side plus deliberate duplicate pairings: for
   * o_orderkey % 10 <= 2 a SECOND external row with identical join keys
   * but shifted id/provenance (+20M) — so those internals match two
   * externals and the full pass's duplicate-displacement path
   * (first kept, last re-added to the external remanents) is exercised
   * and value-checked.
   */
  def externalWithDups(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val dup = o.select(
      (col("o_orderkey") + lit(20000000L)).cast("string").as("ext_id"),
      col("o_orderkey").cast("string").as("ext_code"),
      col("o_totalprice").as("ext_amount"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ext_ts"),
      col("o_orderpriority").as("ext_prio"),
      (col("o_orderkey") + lit(20000000L)).as("ext_row"))
      .where(col("o_orderkey") % 10 <= 2)
    external(spark, dir).unionByName(dup)
  }
}

/**
 * ANSI-SQL mirrors of [[TpcMapping]] for the DuckDB oracle. Kept adjacent so
 * Scala and SQL derivations evolve together; every `SparkEntry.oracleSql`
 * entry composes these CTE bodies.
 */
object OracleSql {

  /** CTE body ≡ TpcMapping.internal. */
  val internalSql: String =
    """SELECT CAST(o_orderkey AS VARCHAR) AS _id,
      |  CAST(o_orderkey AS VARCHAR) AS transaction_code,
      |  o_totalprice AS approved_transaction_amount,
      |  epoch_ms(o_orderdate) AS create_timestamp,
      |  o_orderstatus AS transaction_type,
      |  CAST(o_custkey AS VARCHAR) AS ticket_code,
      |  CAST(o_custkey AS VARCHAR) AS sale_ticket_code,
      |  o_orderpriority AS bin_code,
      |  CAST(trunc(o_totalprice / 10000) AS BIGINT) AS amount_band,
      |  o_orderkey AS row_order
      |FROM orders""".stripMargin

  /** CTE body ≡ TpcMapping.external. */
  val externalSql: String =
    """SELECT CAST(o_orderkey AS VARCHAR) AS ext_id,
      |  CAST(o_orderkey AS VARCHAR) AS ext_code,
      |  o_totalprice AS ext_amount,
      |  epoch_ms(o_orderdate) AS ext_ts,
      |  o_orderpriority AS ext_prio,
      |  o_orderkey AS ext_row
      |FROM orders WHERE o_orderkey % 10 <= 6
      |UNION ALL
      |SELECT CAST(o_orderkey AS VARCHAR),
      |  CAST(o_orderkey AS VARCHAR),
      |  o_totalprice + 0.05,
      |  epoch_ms(o_orderdate),
      |  o_orderpriority,
      |  o_orderkey
      |FROM orders WHERE o_orderkey % 10 BETWEEN 7 AND 8
      |UNION ALL
      |SELECT CAST(o_orderkey + 10000000 AS VARCHAR),
      |  CAST(o_orderkey + 10000000 AS VARCHAR),
      |  o_totalprice,
      |  epoch_ms(o_orderdate),
      |  o_orderpriority,
      |  o_orderkey + 10000000
      |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin

  /** CTE body ≡ TpcMapping.externalWithDups' extra branch. */
  val externalDupSql: String =
    """SELECT CAST(o_orderkey + 20000000 AS VARCHAR) AS ext_id,
      |  CAST(o_orderkey AS VARCHAR) AS ext_code,
      |  o_totalprice AS ext_amount,
      |  epoch_ms(o_orderdate) AS ext_ts,
      |  o_orderpriority AS ext_prio,
      |  o_orderkey + 20000000 AS ext_row
      |FROM orders WHERE o_orderkey % 10 <= 2""".stripMargin

  /** Shared WITH prelude for recon oracles. */
  val prelude: String =
    s"WITH internal AS (\n$internalSql\n), external AS (\n$externalSql\n)"

  /** Prelude variant adding the duplicate-pairing external (extdup CTE). */
  val preludeWithDups: String =
    s"$prelude, extdup AS (\nSELECT * FROM external\nUNION ALL\n$externalDupSql\n)"

  /** The 4-key equi-join predicate between the CTEs. */
  val joinOn: String =
    "internal.transaction_code = external.ext_code AND " +
      "internal.approved_transaction_amount = external.ext_amount AND " +
      "internal.create_timestamp = external.ext_ts AND " +
      "internal.bin_code = external.ext_prio"
}
