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

  /** The ledger frame `(file_path, batch_id)`; empty if none yet. */
  def ledger(spark: SparkSession, ledgerPath: String): DataFrame = {
    val p = new Path(ledgerPath)
    if (fs(spark, p).exists(p)) spark.read.parquet(ledgerPath)
    else spark.range(0).select(lit("").as("file_path"), lit(0L).as("batch_id"))
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
}
