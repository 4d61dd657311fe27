package graft.demo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.recon._

/**
 * Every SURVEY §2 reconciliation operator exposed as a named, oracle-checked
 * query over the driver testdata, wired through the graft.recon library.
 * Spark implementation and DuckDB oracle SQL live side by side so they
 * cannot drift apart.
 */
object ReconQueries {
  import TpcMapping.{conf, audit}
  import OracleSql.{prelude, joinOn}

  private val recon = new Reconciler(conf)
  private val extOrder: Column = col("ext_row")

  private def I(s: SparkSession, d: String) = TpcMapping.internal(s, d)
  private def E(s: SparkSession, d: String) = TpcMapping.external(s, d)

  private val auditSqlCols: String =
    s"""'${conf.keyCodeCsv}' AS conciliation_key_code,
       |  '${audit.executionId}' AS execution_id,
       |  '${audit.executionDate}' AS execution_date,
       |  ${audit.executionTimestamp} AS execution_timestamp,
       |  '${audit.externalSourceName}' AS external_source_name""".stripMargin

  /** join predicate with explicit aliases, for sub-query reuse. */
  private def joinOnAl(i: String, e: String): String =
    s"$i.transaction_code = $e.ext_code AND $i.approved_transaction_amount = $e.ext_amount AND " +
      s"$i.create_timestamp = $e.ext_ts AND $i.bin_code = $e.ext_prio"

  private val matchSelect = Seq(
    "_id", "ext_id", "transaction_code", "approved_transaction_amount",
    "create_timestamp", "bin_code")

  val all: Seq[QuerySpec] = Seq(

    // S1/P1/P2/P8 — typed pushdown scan of the internal ledger
    QuerySpec("recon_internal_scan",
      s"$prelude SELECT * FROM internal") { (s, d) => I(s, d) },

    // S3/S5/U1 — the derived external settlement side
    QuerySpec("recon_external_scan",
      s"$prelude SELECT * FROM external") { (s, d) => E(s, d) },

    // J1 + P6 — multi-key inner equi-join with audit literals
    QuerySpec("recon_match",
      s"""$prelude
         |SELECT internal._id AS _id, external.ext_id AS ext_id,
         |  internal.transaction_code AS transaction_code,
         |  internal.approved_transaction_amount AS approved_transaction_amount,
         |  internal.create_timestamp AS create_timestamp,
         |  internal.bin_code AS bin_code,
         |  'CONCILIATED' AS conciliation_status,
         |  $auditSqlCols
         |FROM internal JOIN external ON $joinOn""".stripMargin) { (s, d) =>
      val m = recon.matchRecords(I(s, d), E(s, d))
      ExprBuilder.withAudit(m, conf, audit, "CONCILIATED")
        .select((matchSelect ++ Seq("conciliation_status", "conciliation_key_code",
          "execution_id", "execution_date", "execution_timestamp",
          "external_source_name")).map(col): _*)
    },

    // J2 — internal remanents (anti a→b)
    QuerySpec("recon_anti_internal",
      s"""$prelude
         |SELECT i.*, 'REMANENT' AS conciliation_status
         |FROM internal i
         |WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})""".stripMargin) { (s, d) =>
      recon.notMatchInternal(I(s, d), E(s, d))
        .withColumn("conciliation_status", lit("REMANENT"))
    },

    // J3 — external remanents (anti b→a)
    QuerySpec("recon_anti_external",
      s"""$prelude
         |SELECT e.*, 'REMANENT' AS conciliation_status
         |FROM external e
         |WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})""".stripMargin) { (s, d) =>
      recon.notMatchExternal(I(s, d), E(s, d))
        .withColumn("conciliation_status", lit("REMANENT"))
    },

    // J4 (join half) — zero-effect SALE⋈VOID pairs on the TWO-column rule
    // (ticket + banded amount, the reference's [ticket_code, amount] shape)
    QuerySpec("recon_zero_effect_pairs",
      s"""$prelude,
         |s1 AS (SELECT * FROM (SELECT i.*, row_number() OVER (PARTITION BY ticket_code, amount_band ORDER BY row_order) AS rn
         |       FROM internal i WHERE transaction_type = 'O') WHERE rn = 1),
         |v1 AS (SELECT * FROM (SELECT i.*, row_number() OVER (PARTITION BY sale_ticket_code, amount_band ORDER BY row_order) AS rn
         |       FROM internal i WHERE transaction_type = 'F') WHERE rn = 1)
         |SELECT s1._id AS sale_id, v1._id AS void_id
         |FROM s1 JOIN v1 ON s1.ticket_code = v1.sale_ticket_code AND s1.amount_band = v1.amount_band""".stripMargin) { (s, d) =>
      recon.applyZeroEffect(I(s, d), conf.zeroEffect.get, col("row_order"))._2
    },

    // J4 (anti half) — internal set reduced by the cancelled pairs
    QuerySpec("recon_zero_effect_reduced",
      s"""$prelude,
         |s1 AS (SELECT * FROM (SELECT i.*, row_number() OVER (PARTITION BY ticket_code, amount_band ORDER BY row_order) AS rn
         |       FROM internal i WHERE transaction_type = 'O') WHERE rn = 1),
         |v1 AS (SELECT * FROM (SELECT i.*, row_number() OVER (PARTITION BY sale_ticket_code, amount_band ORDER BY row_order) AS rn
         |       FROM internal i WHERE transaction_type = 'F') WHERE rn = 1),
         |pairs AS (SELECT s1._id AS sale_id, v1._id AS void_id
         |          FROM s1 JOIN v1 ON s1.ticket_code = v1.sale_ticket_code AND s1.amount_band = v1.amount_band)
         |SELECT i.* FROM internal i
         |WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.sale_id = i._id)
         |  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.void_id = i._id)""".stripMargin) { (s, d) =>
      recon.applyZeroEffect(I(s, d), conf.zeroEffect.get, col("row_order"))._1
    },

    // J5 — tolerance (band) join with greedy best-match-per-row
    QuerySpec("recon_tolerance",
      s"""$prelude,
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT * FROM external e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})),
         |cand AS (SELECT i._id AS _id, e.ext_id AS ext_id,
         |           abs(i.approved_transaction_amount - e.ext_amount) AS tolerance_diff, e.ext_row AS ext_row
         |         FROM arem i JOIN brem e
         |           ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio
         |         WHERE abs(i.approved_transaction_amount - e.ext_amount) <= 0.1)
         |SELECT _id, ext_id, tolerance_diff
         |FROM (SELECT *, row_number() OVER (PARTITION BY _id ORDER BY tolerance_diff, ext_row) AS rn FROM cand)
         |WHERE rn = 1""".stripMargin) { (s, d) =>
      val a = I(s, d); val e = E(s, d)
      val aRem = recon.notMatchInternal(a, e)
      val bRem = recon.notMatchExternal(a, e)
      recon.toleranceMatch(aRem, bRem, conf.tolerance.get, extOrder)
        .select(col("_id"), col("ext_id"), col("tolerance_diff"))
    },

    // P4 + A3 — match on reduced keys then dual keep-first dedup
    QuerySpec("recon_match_dedup",
      s"""$prelude,
         |m AS (SELECT i._id AS _id, e.ext_id AS ext_id, e.ext_row AS ext_row
         |      FROM internal i JOIN external e ON i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio),
         |d1 AS (SELECT _id, ext_id FROM (SELECT *, row_number() OVER (PARTITION BY _id ORDER BY ext_row, ext_id) AS rn FROM m) WHERE rn = 1)
         |SELECT _id, ext_id
         |FROM (SELECT _id, ext_id, row_number() OVER (PARTITION BY ext_id ORDER BY _id) AS rn2 FROM d1)
         |WHERE rn2 = 1""".stripMargin) { (s, d) =>
      val reducedConf = conf.copy(keys = Seq(KeyPair("ext_ts", "create_timestamp"), KeyPair("ext_prio", "bin_code")))
      val m = new Reconciler(reducedConf).matchRecords(I(s, d), E(s, d))
        .select(col("_id"), col("ext_id"), col("ext_row"))
      new Reconciler(reducedConf).processDuplicates(m, extOrder)
        .select(col("_id"), col("ext_id"))
    },

    // P4 — duplicate-key probe (window count, no self-join)
    QuerySpec("recon_dup_probe",
      s"""$prelude,
         |m AS (SELECT i._id AS _id, e.ext_id AS ext_id
         |      FROM internal i JOIN external e ON i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio)
         |SELECT _id, ext_id FROM (SELECT _id, ext_id, count(*) OVER (PARTITION BY _id) AS c FROM m) WHERE c > 1""".stripMargin) { (s, d) =>
      val reducedConf = conf.copy(keys = Seq(KeyPair("ext_ts", "create_timestamp"), KeyPair("ext_prio", "bin_code")))
      val m = new Reconciler(reducedConf).matchRecords(I(s, d), E(s, d))
        .select(col("_id"), col("ext_id"))
      recon.duplicated(m, Seq("_id"))
    },

    // A1/S9 — run summary: exact decimal sums + counts, one row
    QuerySpec("recon_summary",
      s"""$prelude,
         |m AS (SELECT i._id AS _id, i.approved_transaction_amount AS amt
         |      FROM internal i JOIN external e ON ${joinOnAl("i", "e")}),
         |arem AS (SELECT _id, approved_transaction_amount AS amt FROM internal i
         |         WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT ext_id, ext_amount AS amt FROM external e
         |         WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")}))
         |SELECT
         |  (SELECT CAST(coalesce(SUM(CAST(amt AS DECIMAL(18,2))), 0) AS DOUBLE) FROM m) AS conciliated_amount,
         |  (SELECT count(_id) FROM m) AS conciliated_count,
         |  (SELECT CAST(coalesce(SUM(CAST(amt AS DECIMAL(18,2))), 0) AS DOUBLE) FROM arem) AS internal_remanent_amount,
         |  (SELECT count(_id) FROM arem) AS internal_remanent_count,
         |  (SELECT CAST(coalesce(SUM(CAST(amt AS DECIMAL(18,2))), 0) AS DOUBLE) FROM brem) AS external_remanent_amount,
         |  (SELECT count(ext_id) FROM brem) AS external_remanent_count""".stripMargin) { (s, d) =>
      val a = I(s, d); val e = E(s, d)
      Sinks.summary(
        recon.matchRecords(a, e), recon.notMatchInternal(a, e), recon.notMatchExternal(a, e),
        amountCol = "approved_transaction_amount", extAmountCol = "ext_amount",
        idField = "_id", extIdField = "ext_id")
    },

    // S10 — seed job: date-window filter + PENDING literals
    QuerySpec("recon_seed",
      s"""$prelude
         |SELECT _id, transaction_code, create_timestamp,
         |  'PENDING' AS conciliation_status, '${audit.executionId}' AS execution_id
         |FROM internal
         |WHERE create_timestamp >= 852076800000 AND create_timestamp < 883612800000""".stripMargin) { (s, d) =>
      TpcMapping.internalInWindow(s, d, 852076800000L, 883612800000L)
        .select(col("_id"), col("transaction_code"), col("create_timestamp"),
          lit("PENDING").as("conciliation_status"), lit(audit.executionId).as("execution_id"))
    },

    // S2/J6 — remanent id re-read: semi join back into the full ledger
    QuerySpec("recon_remanent_lookup",
      s"""$prelude
         |SELECT i.* FROM internal i
         |WHERE EXISTS (SELECT 1 FROM external e WHERE e.ext_code = i._id)""".stripMargin) { (s, d) =>
      val ids = E(s, d).select(col("ext_code").as("_id"))
      Sources.remanentLookup(ids, I(s, d), "_id")
    },

    // U1 + A3 — concat current+remanent batches, current wins per id
    QuerySpec("recon_concat_prefer",
      s"""$prelude,
         |cur AS (SELECT _id, 'current' AS batch, 0 AS pref FROM internal WHERE row_order % 2 = 0),
         |rem AS (SELECT _id, 'remanent' AS batch, 1 AS pref FROM internal WHERE row_order % 3 = 0),
         |u AS (SELECT * FROM cur UNION ALL SELECT * FROM rem)
         |SELECT _id, batch
         |FROM (SELECT _id, batch, row_number() OVER (PARTITION BY _id ORDER BY pref) AS rn FROM u)
         |WHERE rn = 1""".stripMargin) { (s, d) =>
      val i = I(s, d)
      val cur = i.where(col("row_order") % 2 === 0).select(col("_id"), lit("current").as("batch"))
      val rem = i.where(col("row_order") % 3 === 0).select(col("_id"), lit("remanent").as("batch"))
      Sources.concatPreferFirst(cur, rem, "_id")
    },

    // S8/S10 — upsert emulation, whenMatched: replace
    QuerySpec("recon_upsert",
      s"""$prelude,
         |existing AS (SELECT _id, 'old' AS batch FROM internal WHERE row_order % 3 = 0),
         |incoming AS (SELECT _id, 'new' AS batch FROM internal WHERE row_order % 2 = 0)
         |SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM incoming n WHERE n._id = e._id)
         |UNION ALL SELECT * FROM incoming""".stripMargin) { (s, d) =>
      val i = I(s, d)
      val existing = i.where(col("row_order") % 3 === 0).select(col("_id"), lit("old").as("batch"))
      val incoming = i.where(col("row_order") % 2 === 0).select(col("_id"), lit("new").as("batch"))
      Sinks.upsert(existing, incoming, "_id", overwrite = true)
    },

    // P9 — deterministic row-provenance index over an explicit order,
    // distributed (range partitions + per-partition offsets; no
    // single-partition window task)
    QuerySpec("recon_row_index",
      s"""$prelude
         |SELECT _id, row_number() OVER (ORDER BY row_order) AS file_row_number FROM internal""".stripMargin) { (s, d) =>
      Sources.withRowIndexRanged(I(s, d), "file_row_number", Seq(col("row_order")))
        .select(col("_id"), col("file_row_number"))
    },

    // P3/P5 — equality + in-list + range predicates (pushed to the scan)
    QuerySpec("recon_filter_range",
      s"""$prelude
         |SELECT _id, transaction_type, bin_code, create_timestamp FROM internal
         |WHERE transaction_type IN ('O','F') AND bin_code = '2-HIGH'
         |  AND create_timestamp >= 852076800000 AND create_timestamp < 915148800000""".stripMargin) { (s, d) =>
      TpcMapping.internalInWindow(s, d, 852076800000L, 915148800000L)
        .where(col("transaction_type").isin("O", "F") && col("bin_code") === "2-HIGH")
        .select(col("_id"), col("transaction_type"), col("bin_code"), col("create_timestamp"))
    },

    // U2 — diagonal union: differing schemas, missing columns null-filled
    QuerySpec("recon_union_diagonal",
      s"""$prelude
         |SELECT internal._id AS _id, external.ext_id AS ext_id FROM internal JOIN external ON $joinOn
         |UNION ALL BY NAME
         |SELECT i._id AS _id, i.transaction_type AS transaction_type FROM internal i
         |WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})""".stripMargin) { (s, d) =>
      val a = I(s, d); val e = E(s, d)
      val m = recon.matchRecords(a, e).select(col("_id"), col("ext_id"))
      val r = recon.notMatchInternal(a, e).select(col("_id"), col("transaction_type"))
      recon.diagonalUnion(Seq(m, r))
    },

    // O1/O2 — deterministic total-order sort (tolerance candidates best-first)
    QuerySpec("recon_sort",
      s"""$prelude,
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT * FROM external e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")}))
         |SELECT i._id AS _id, e.ext_id AS ext_id,
         |  abs(i.approved_transaction_amount - e.ext_amount) AS tolerance_diff
         |FROM arem i JOIN brem e
         |  ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio
         |WHERE abs(i.approved_transaction_amount - e.ext_amount) <= 0.1
         |ORDER BY tolerance_diff, _id, ext_id""".stripMargin) { (s, d) =>
      val a = I(s, d); val e = E(s, d)
      val aRem = recon.notMatchInternal(a, e)
      val bRem = recon.notMatchExternal(a, e)
      val rule = conf.tolerance.get
      val ta = aRem.alias("sa"); val tb = bRem.alias("sb")
      val equi = conf.keysWithoutTolerance
        .map(kp => col(s"sa.${kp.internal}") === col(s"sb.${kp.external}")).reduce(_ && _)
      val diff = abs(col(s"sa.${rule.pair.internal}") - col(s"sb.${rule.pair.external}"))
      // materialize before the global sort: range partitioning samples its
      // child to pick boundaries, which would otherwise execute the whole
      // anti-join + band-join chain twice
      ta.join(tb, equi && diff <= lit(rule.tolerance))
        .select(col("_id"), col("ext_id"), diff.as("tolerance_diff"))
        .transform(df => Checkpoints.cut(df))
        .orderBy(col("tolerance_diff"), col("_id"), col("ext_id"))
    },

    // P11 — prefix-selector projection over the prepped external frame
    QuerySpec("recon_prefix_select",
      s"""$prelude
         |SELECT ext_id, ext_code, ext_amount, ext_ts, ext_prio, ext_row FROM external""".stripMargin) { (s, d) =>
      ExprBuilder.selectByPrefix(E(s, d), "ext_")
    },

    // THE full reference pass over an external side with duplicate
    // pairings: exact match + _process_duplicates displacement (first
    // pairing kept, last pairing's external row re-added to the external
    // remanents) + tolerance second chance with the one-external-used-once
    // invariant — every stage mirrored in the oracle
    QuerySpec("recon_pass_full",
      s"""${OracleSql.preludeWithDups},
         |m AS (SELECT i._id AS _id, e.ext_id AS ext_id, e.ext_row AS ext_row
         |      FROM internal i JOIN extdup e ON ${joinOnAl("i", "e")}),
         |kept AS (SELECT _id, ext_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY _id ORDER BY ext_row, ext_id) AS rn FROM m) WHERE rn = 1),
         |disp AS (SELECT ext_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY _id ORDER BY ext_row DESC, ext_id DESC) AS rn,
         |    count(*) OVER (PARTITION BY _id) AS c FROM m) WHERE c > 1 AND rn = 1),
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM extdup e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT e.* FROM extdup e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})
         |         UNION ALL SELECT e.* FROM extdup e JOIN disp d ON e.ext_id = d.ext_id),
         |cand AS (SELECT i._id AS _id, e.ext_id AS ext_id,
         |           abs(i.approved_transaction_amount - e.ext_amount) AS tolerance_diff, e.ext_row AS ext_row
         |         FROM arem i JOIN brem e
         |           ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio
         |         WHERE abs(i.approved_transaction_amount - e.ext_amount) <= 0.1),
         |tol1 AS (SELECT _id, ext_id, tolerance_diff FROM (
         |  SELECT *, row_number() OVER (PARTITION BY _id ORDER BY tolerance_diff, ext_row) AS rn FROM cand) WHERE rn = 1),
         |tol AS (SELECT _id, ext_id, tolerance_diff FROM (
         |  SELECT *, row_number() OVER (PARTITION BY ext_id ORDER BY tolerance_diff, _id) AS rn2 FROM tol1) WHERE rn2 = 1)
         |SELECT _id, ext_id, CAST(0.0 AS DOUBLE) AS tolerance_diff, 'MATCHED' AS status FROM kept
         |UNION ALL
         |SELECT _id, ext_id, tolerance_diff, 'MATCHED' AS status FROM tol
         |UNION ALL
         |SELECT a2._id, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), 'INTERNAL_REMANENT'
         |FROM arem a2 WHERE NOT EXISTS (SELECT 1 FROM tol t WHERE t._id = a2._id)
         |UNION ALL
         |SELECT CAST(NULL AS VARCHAR), b2.ext_id, CAST(NULL AS DOUBLE), 'EXTERNAL_REMANENT'
         |FROM brem b2 WHERE NOT EXISTS (SELECT 1 FROM tol t WHERE t.ext_id = b2.ext_id)""".stripMargin) { (s, d) =>
      val r = recon.reconcilePass(I(s, d), TpcMapping.externalWithDups(s, d), extOrder,
        truncate = true)
      recon.diagonalUnion(Seq(
        r.matched.select(col("_id"), col("ext_id"), col("tolerance_diff"),
          lit("MATCHED").as("status")),
        r.internalRemanent.select(col("_id"), lit("INTERNAL_REMANENT").as("status")),
        r.externalRemanent.select(col("ext_id"), lit("EXTERNAL_REMANENT").as("status"))))
    },

    // new_rc_step — two-pass iterative reconciliation (exact, then tolerance)
    QuerySpec("recon_iterate2",
      s"""$prelude,
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT * FROM external e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})),
         |cand AS (SELECT i._id AS _id, e.ext_id AS ext_id,
         |           abs(i.approved_transaction_amount - e.ext_amount) AS tolerance_diff, e.ext_row AS ext_row
         |         FROM arem i JOIN brem e
         |           ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio
         |         WHERE abs(i.approved_transaction_amount - e.ext_amount) <= 0.1)
         |SELECT internal._id AS _id, external.ext_id AS ext_id, CAST(NULL AS DOUBLE) AS tolerance_diff
         |FROM internal JOIN external ON $joinOn
         |UNION ALL
         |SELECT _id, ext_id, tolerance_diff
         |FROM (SELECT *, row_number() OVER (PARTITION BY _id ORDER BY tolerance_diff, ext_row) AS rn FROM cand)
         |WHERE rn = 1""".stripMargin) { (s, d) =>
      val passes = Seq(conf.copy(tolerance = None), conf)
      // truncateLineage: pass 2 consumes pass 1's remanents in three places
      // (match + both antis) — materializing them once stops pass-1's
      // anti-join chain re-executing per consumer
      recon.iterate(I(s, d), E(s, d), extOrder, passes, truncateLineage = true)
        .matched.select(col("_id"), col("ext_id"), col("tolerance_diff"))
    },

    // new_rc_step with PER-PASS KEY RELAXATION — the reference's actual
    // multi-pass point (it swaps rules between passes,
    // reference: src/reconciliatior.py:201-206): pass 1 matches on all 4
    // keys, pass 2 re-matches the remanents with the amount key DROPPED,
    // which exactly captures the fixture's +0.05-perturbed settlement rows.
    // Proves the `passes: Seq[ReconConfig]` hook changes behavior per pass
    // (recon_iterate2 above runs a fixed config, where pass 2 is idempotent)
    QuerySpec("recon_iterate_relaxed",
      s"""$prelude,
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT * FROM external e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")}))
         |SELECT internal._id AS _id, external.ext_id AS ext_id, 1 AS pass
         |FROM internal JOIN external ON $joinOn
         |UNION ALL
         |SELECT i._id AS _id, e.ext_id AS ext_id, 2 AS pass
         |FROM arem i JOIN brem e
         |  ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts AND i.bin_code = e.ext_prio""".stripMargin) { (s, d) =>
      val relaxed = conf.copy(
        keys = conf.keys.filterNot(_.internal == "approved_transaction_amount"),
        tolerance = None)
      val passes = Seq(conf.copy(tolerance = None), relaxed)
      val a = I(s, d)
      val b = E(s, d)
      // tag rows by pass so the value check proves WHICH pass matched each
      // pair: run the two passes through iterate, then recover the pass
      // split by re-deriving pass 1's key match on the matched output
      val m = recon.iterate(a, b, extOrder, passes, truncateLineage = true).matched
      val exactCond = conf.keys
        .map(kp => col(kp.internal) === col(kp.external)).reduce(_ && _)
      m.select(col("_id"), col("ext_id"),
        when(exactCond, lit(1)).otherwise(lit(2)).as("pass"))
    },

    // THREE-way ledger reconciliation with majority vote — the
    // extension every 2-way shop eventually needs when a processor
    // ledger joins the internal and settlement ones. Amounts in exact
    // cents; per key: 'all_match' (3 equal, suppressed from output),
    // 'majority' (exactly one agreeing pair wins — including the case
    // where the MAJORITY disagrees with the internal ledger, k%10=8
    // here), 'no_quorum' (>=2 present, no pair agrees), 'single'.
    // One full-outer 3-way join keyed on the code; no value ever
    // leaves integer cents
    QuerySpec("recon_three_way",
      raw"""WITH base AS (SELECT o_orderkey AS k,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS a
           |  FROM orders),
           |la AS (SELECT k, a FROM base),
           |lb AS (SELECT k, a + CASE WHEN k % 10 IN (7, 8) THEN 5 ELSE 0 END AS b
           |       FROM base WHERE k % 10 <= 8),
           |lc AS (SELECT k, a + CASE WHEN k % 10 = 8 THEN 5
           |         WHEN k % 10 = 9 THEN 10 ELSE 0 END AS c
           |       FROM base WHERE k % 13 <> 0),
           |j AS (SELECT COALESCE(la.k, lb.k, lc.k) AS k, la.a, lb.b, lc.c
           |      FROM la FULL OUTER JOIN lb ON la.k = lb.k
           |              FULL OUTER JOIN lc ON COALESCE(la.k, lb.k) = lc.k),
           |v AS (SELECT k, a, b, c,
           |    (CASE WHEN a IS NULL THEN 0 ELSE 1 END
           |     + CASE WHEN b IS NULL THEN 0 ELSE 1 END
           |     + CASE WHEN c IS NULL THEN 0 ELSE 1 END) AS n_present,
           |    (a IS NOT NULL AND b IS NOT NULL AND a = b) AS ab,
           |    (a IS NOT NULL AND c IS NOT NULL AND a = c) AS ac,
           |    (b IS NOT NULL AND c IS NOT NULL AND b = c) AS bc
           |  FROM j)
           |SELECT CAST(k AS VARCHAR) AS transaction_code,
           |  CAST(n_present AS BIGINT) AS n_present,
           |  CASE WHEN ab AND bc THEN 'all_match'
           |    WHEN ab OR ac OR bc THEN 'majority'
           |    WHEN n_present >= 2 THEN 'no_quorum' ELSE 'single' END AS status,
           |  CAST(CASE WHEN ab OR ac THEN a WHEN bc THEN b END AS BIGINT)
           |    AS settled_cents,
           |  a AS a_cents, b AS b_cents, c AS c_cents
           |FROM v WHERE NOT (ab AND bc)""".stripMargin) { (s, d) =>
      val base = s.read.parquet(s"$d/orders.parquet").select(
        col("o_orderkey").as("k"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("a"))
      val la = base
      val lb = base.where(col("k") % 10 <= 8)
        .select(col("k").as("kb"),
          (col("a") + when(col("k") % 10 === 7 || col("k") % 10 === 8, 5L)
            .otherwise(0L)).as("b"))
      val lc = base.where(col("k") % 13 =!= 0)
        .select(col("k").as("kc"),
          (col("a") + when(col("k") % 10 === 8, 5L)
            .when(col("k") % 10 === 9, 10L).otherwise(0L)).as("c"))
      val j = la.join(lb, col("k") === col("kb"), "full_outer")
        .join(lc, coalesce(col("k"), col("kb")) === col("kc"), "full_outer")
        .select(coalesce(col("k"), col("kb"), col("kc")).as("kk"),
          col("a"), col("b"), col("c"))
      val v = j.select(col("kk"), col("a"), col("b"), col("c"),
        (when(col("a").isNull, 0).otherwise(1)
          + when(col("b").isNull, 0).otherwise(1)
          + when(col("c").isNull, 0).otherwise(1)).as("n_present"),
        (col("a").isNotNull && col("b").isNotNull && col("a") === col("b")).as("ab"),
        (col("a").isNotNull && col("c").isNotNull && col("a") === col("c")).as("ac"),
        (col("b").isNotNull && col("c").isNotNull && col("b") === col("c")).as("bc"))
      v.where(!(col("ab") && col("bc")))
        .select(col("kk").cast("string").as("transaction_code"),
          col("n_present").cast("long").as("n_present"),
          when(col("ab") && col("bc"), "all_match")
            .when(col("ab") || col("ac") || col("bc"), "majority")
            .when(col("n_present") >= 2, "no_quorum")
            .otherwise("single").as("status"),
          when(col("ab") || col("ac"), col("a"))
            .when(col("bc"), col("b")).as("settled_cents"),
          col("a").as("a_cents"), col("b").as("b_cents"), col("c").as("c_cents"))
    },

    // tolerance sensitivity curve: candidate remanent pairs within the
    // band at widening cent thresholds (1/5/10/25/50) — how much a
    // looser tolerance would buy BEFORE committing to one (the recon
    // twin of dedup_cost_curve). Amounts diffed in exact integer
    // cents; n_internals counts distinct ledger rows coverable at each
    // threshold, the number the greedy matcher can at best settle
    QuerySpec("recon_tolerance_curve",
      s"""$prelude,
         |arem AS (SELECT * FROM internal i WHERE NOT EXISTS (SELECT 1 FROM external e WHERE ${joinOnAl("i", "e")})),
         |brem AS (SELECT * FROM external e WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})),
         |cand AS (SELECT i._id, e.ext_id,
         |    abs(CAST(CAST(i.approved_transaction_amount AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      - CAST(CAST(e.ext_amount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS diff_cents
         |  FROM arem i JOIN brem e
         |    ON i.transaction_code = e.ext_code AND i.create_timestamp = e.ext_ts
         |      AND i.bin_code = e.ext_prio),
         |th AS (SELECT CAST(unnest([1, 5, 10, 25, 50]) AS BIGINT) AS t_cents)
         |SELECT th.t_cents, CAST(count(cand._id) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT cand._id) AS BIGINT) AS n_internals
         |FROM th LEFT JOIN cand ON cand.diff_cents <= th.t_cents
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val a = I(s, d)
      val b = E(s, d)
      val cand = recon.notMatchInternal(a, b)
        .select(col("_id"), col("transaction_code"), col("create_timestamp"),
          col("bin_code"),
          expr("cast(cast(approved_transaction_amount as decimal(18,2)) * 100 as bigint)")
            .as("ic"))
        .join(recon.notMatchExternal(a, b)
            .select(col("ext_code"), col("ext_ts"), col("ext_prio"),
              expr("cast(cast(ext_amount as decimal(18,2)) * 100 as bigint)").as("ec")),
          col("transaction_code") === col("ext_code") &&
            col("create_timestamp") === col("ext_ts") &&
            col("bin_code") === col("ext_prio"))
        .select(col("_id"), abs(col("ic") - col("ec")).as("diff_cents"))
      val th = s.createDataset(Seq(1L, 5L, 10L, 25L, 50L))(
        org.apache.spark.sql.Encoders.scalaLong).toDF("t_cents")
      broadcast(th).join(cand, col("diff_cents") <= col("t_cents"), "left")
        .groupBy(col("t_cents"))
        .agg(count(col("_id")).as("n_pairs"),
          countDistinct(col("_id")).as("n_internals"))
    },

    // aging report over the unmatched remanents — the ops dashboard a
    // reconciliation team works from: every external row with no
    // internal partner, bucketed by days outstanding relative to the
    // ledger's newest day. Buckets 0-7 / 8-30 / 31-90 / 90+; exact
    // cent sums via DECIMAL so the money column survives aggregation
    QuerySpec("recon_aging_buckets",
      s"""$prelude,
         |brem AS (SELECT * FROM external e
         |         WHERE NOT EXISTS (SELECT 1 FROM internal i WHERE ${joinOnAl("i", "e")})),
         |mx AS (SELECT max(create_timestamp) // 86400000 AS mxd FROM internal),
         |aged AS (SELECT e.ext_id,
         |    mx.mxd - e.ext_ts // 86400000 AS age_days,
         |    CAST(CAST(e.ext_amount AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM brem e, mx)
         |SELECT CASE WHEN age_days <= 7 THEN '00-07'
         |    WHEN age_days <= 30 THEN '08-30'
         |    WHEN age_days <= 90 THEN '31-90' ELSE '90+' END AS age_bucket,
         |  CAST(count(*) AS BIGINT) AS n_items,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  CAST(min(age_days) AS BIGINT) AS min_age_days,
         |  CAST(max(age_days) AS BIGINT) AS max_age_days
         |FROM aged GROUP BY 1""".stripMargin) { (s, d) =>
      val a = I(s, d)
      val b = E(s, d)
      val brem = recon.notMatchExternal(a, b)
      val mx = a.agg(expr("max(create_timestamp) div 86400000").as("mxd"))
      brem.crossJoin(broadcast(mx))
        .select((col("mxd") - expr("ext_ts div 86400000")).as("age_days"),
          expr("cast(cast(ext_amount as decimal(18,2)) * 100 as bigint)").as("cents"))
        .groupBy(when(col("age_days") <= 7, "00-07")
          .when(col("age_days") <= 30, "08-30")
          .when(col("age_days") <= 90, "31-90")
          .otherwise("90+").as("age_bucket"))
        .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("sum_cents"),
          min(col("age_days")).as("min_age_days"),
          max(col("age_days")).as("max_age_days"))
    }
  )
}
