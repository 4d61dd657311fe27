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
    }
  )
}
