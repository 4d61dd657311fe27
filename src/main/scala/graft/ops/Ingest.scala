package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-ingest ledger: exactly-once batch ingestion over a growing
 * directory. A 100 TB corpus accretes files continuously; the daily
 * job must process each file ONCE — rescanning everything is a full
 * read, and "newer than last run's clock" breaks on clock skew,
 * backfills, and late-arriving replicas. The ledger records which
 * file paths were ingested; the next run processes the set difference
 * and appends to the ledger.
 *
 * The directory LISTING is driver-side by design — the same driver
 * budget every table format spends (~200k paths at 100 TB; the DATA
 * never passes through the driver). The ledger DIFF is not: a
 * years-long ledger is millions of paths, so membership runs as an
 * anti-join/semi-join against the ledger frame — only the NEW batch
 * (bounded by arrival rate, not history) ever funnels back to the
 * driver. Ledger appends are new-file-only parquet writes;
 * re-committing an already-ledgered path is rejected, so a crashed
 * run that re-lists cannot double-ingest. Single-writer contract,
 * like [[IndexStore]].
 */
object Ingest {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Root of the COMPACTED ledger snapshots — a [[graft.recon.Publish]]
    * versioned layout beside the append dir, so the fold is promoted by
    * one atomic pointer flip and readers never see a half-written
    * snapshot. */
  private[graft] def ledgerCompactRoot(ledgerPath: String): String =
    ledgerPath.stripSuffix("/") + "__compacted"

  /** The append-side ledger part files currently on disk (flat,
    * non-hidden — [[commit]] writes `coalesce(1)` parquet appends). */
  private def rawLedgerFiles(spark: SparkSession, ledgerPath: String): Seq[String] = {
    val p = new Path(ledgerPath)
    val f = fs(spark, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** The ledger frame `(file_path, batch_id)`; empty if none yet. Reads
    * the promoted compacted snapshot (if any) plus the raw appends since
    * it. A crash inside [[compactLedger]]'s delete window can leave a
    * row in BOTH — harmless by construction: every consumer is an
    * anti/semi-join membership probe or a max, and the next compaction
    * folds the duplicates away. */
  def ledger(spark: SparkSession, ledgerPath: String): DataFrame = {
    val cols = Seq(col("file_path"), col("batch_id"))
    val compacted = graft.recon.Publish
      .currentVersion(spark, ledgerCompactRoot(ledgerPath))
      .map(_ => graft.recon.Publish.readCurrent(spark, ledgerCompactRoot(ledgerPath))
        .select(cols: _*))
    val raws = rawLedgerFiles(spark, ledgerPath)
    val raw = if (raws.isEmpty) None
      else Some(spark.read.parquet(raws: _*).select(cols: _*))
    (compacted, raw) match {
      case (Some(c), Some(r)) => c.unionByName(r)
      case (Some(c), None) => c
      case (None, Some(r)) => r
      case (None, None) =>
        spark.range(0).select(lit("").as("file_path"), lit(0L).as("batch_id"))
    }
  }

  /**
   * Fold the ledger's append history into ONE promoted snapshot file —
   * the GC that keeps a years-long ledger readable (every [[runOnce]]
   * adds a part file; without compaction the diff join eventually opens
   * millions of tiny footers). Two-phase and crash-safe at every window:
   *
   *   1. snapshot = promoted snapshot ∪ the raw part files listed NOW
   *      (exact-duplicate rows from a previous crash fold away here);
   *   2. [[graft.recon.Publish.publish]] writes it as the next version
   *      and atomically flips the pointer (a crash before the flip
   *      leaves an orphan dir, readers untouched);
   *   3. only then are the folded raw files deleted — a crash mid-delete
   *      leaves duplicate rows, which every ledger consumer tolerates
   *      (see [[ledger]]) and the next compaction removes.
   *
   * Single-writer contract like [[commit]] (run it from the same
   * scheduler slot, never concurrently with an ingest step). Returns the
   * number of raw part files folded; 0 = nothing to compact.
   */
  def compactLedger(spark: SparkSession, ledgerPath: String): Int = {
    val raws = rawLedgerFiles(spark, ledgerPath)
    if (raws.isEmpty) return 0
    val snapshot = ledger(spark, ledgerPath)
      .dropDuplicates(Seq("file_path", "batch_id"))
      .coalesce(1)
    val root = ledgerCompactRoot(ledgerPath)
    graft.recon.Publish.publish(snapshot, root)
    val p = new Path(ledgerPath)
    val f = fs(spark, p)
    raws.foreach(r => f.delete(new Path(r), false))
    graft.recon.Publish.prune(spark, root, keep = 2)
    raws.size
  }

  /** Data files under `dataDir` (non-hidden, recursive) not yet in the
    * ledger, sorted for deterministic batch composition. The ledger
    * diff is a distributed anti-join — the full (unbounded-history)
    * ledger never collects to the driver; only the new batch does. */
  def newFiles(spark: SparkSession, dataDir: String, ledgerPath: String): Seq[String] = {
    val dir = new Path(dataDir)
    val f = fs(spark, dir)
    val listed = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = f.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        listed += st.getPath.toString
    }
    import spark.implicits._
    listed.toSeq.toDF("file_path")
      .join(ledger(spark, ledgerPath).select("file_path"), Seq("file_path"), "left_anti")
      .collect().map(_.getString(0)).sorted.toSeq
  }

  /** Read exactly the given files (from [[newFiles]]); empty frame with
    * the directory's schema when the batch is empty. */
  def readBatch(spark: SparkSession, dataDir: String, files: Seq[String]): DataFrame =
    if (files.isEmpty)
      // footer-only schema read; recursive because ingest dirs nest
      // (day=/hour= style) — matches newFiles' recursive listing
      spark.read.option("recursiveFileLookup", "true").parquet(dataDir)
        .where(lit(false))
    else spark.read.parquet(files: _*)

  /** Record `files` as ingested under `batchId`. Rejects paths already
    * ledgered — the guard that makes a re-listed crash recovery safe.
    * The duplicate probe is a semi-join of the (small) batch against
    * the ledger; the ledger never collects to the driver. */
  def commit(spark: SparkSession, ledgerPath: String, files: Seq[String],
      batchId: Long): Unit = {
    if (files.isEmpty) return
    import spark.implicits._
    val dup = files.toDF("file_path")
      .join(ledger(spark, ledgerPath).select("file_path"), Seq("file_path"), "left_semi")
      .limit(3).collect().map(_.getString(0))
    require(dup.isEmpty,
      s"refusing to re-commit already-ingested files: ${dup.mkString(", ")}")
    files.toDF("file_path").select(col("file_path"), lit(batchId).as("batch_id"))
      .coalesce(1).write.mode("append").parquet(ledgerPath)
  }

  /** [[commit]] for AT-LEAST-ONCE callers (a replayed foreachBatch):
    * already-ledgered paths are silently skipped instead of rejected —
    * the anti-join guard makes a full replay a no-op, a partial one
    * commit-the-rest. Returns the number of files actually ledgered.
    * [[commit]] stays the strict form for the single-shot [[IngestGate]]
    * loop, where a duplicate commit means a logic bug, not a replay. */
  def commitIdempotent(spark: SparkSession, ledgerPath: String,
      files: Seq[String], batchId: Long): Int = {
    if (files.isEmpty) return 0
    import spark.implicits._
    val fresh = files.toDF("file_path")
      .join(ledger(spark, ledgerPath).select("file_path"), Seq("file_path"), "left_anti")
      .collect().map(_.getString(0)).toSeq.sorted
    if (fresh.nonEmpty)
      fresh.toDF("file_path").select(col("file_path"), lit(batchId).as("batch_id"))
        .coalesce(1).write.mode("append").parquet(ledgerPath)
    fresh.size
  }
}
