package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-statistics manifest + skip-scan: the data-skipping layer every
 * table format at lake scale (Delta, Iceberg, Hudi) builds on. A 100 TB
 * table is ~100k–200k parquet files; a range query that touches 0.1% of
 * the key space should OPEN 0.1% of the files, not all of them — footer
 * opens alone dominate otherwise. The manifest records per-file
 * min/max/count for chosen columns (one distributed scan, grouped by
 * `_metadata.file_path`, so stats collection itself never funnels
 * through the driver); pruning intersects the query range with each
 * file's [min, max] envelope and reads only the overlapping files.
 *
 * This composes with [[Layout.zorderBy]] / range layout: stats are only
 * selective when the write layout clusters the stat columns — the
 * manifest of a randomly-laid-out table has every file spanning the
 * full key range and prunes nothing. Build order at scale: layout,
 * then manifest, then skip-scan.
 *
 * Driver-size contract: the PRUNED file list is collected to the driver
 * (that is how a file-source scan is specified); the manifest itself
 * stays distributed. ~200k files × a path string is single-digit MB —
 * the same driver budget Delta/Iceberg planning spends.
 *
 * Null semantics: a file whose stat column is entirely null has
 * null min/max and is pruned. Rows with a null key cannot satisfy a
 * range predicate, so the skip-scan result still equals
 * `full table WHERE key BETWEEN lo AND hi` exactly.
 */
object Manifest {

  /** One distributed pass over the table at `path`: per-file row count
    * and min/max for each of `statCols`. Output columns:
    * `file_path, n_rows, min_<c>, max_<c>…`. */
  def build(spark: SparkSession, path: String, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "no stat columns")
    val df = spark.read.parquet(path)
    df.select(col("_metadata.file_path").as("file_path") +: statCols.map(col): _*)
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_rows"),
        statCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
  }

  /** Manifest rows whose [min, max] envelope for `statCol` overlaps
    * [lo, hi] — the files a range scan must open. */
  def overlapping(manifest: DataFrame, statCol: String, lo: Column, hi: Column): DataFrame =
    manifest.where(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)

  /** Skip-scan: read ONLY the files whose stats envelope overlaps
    * [lo, hi], then apply the exact residual predicate (file overlap is
    * necessary, not sufficient). Result ≡ reading the whole table with
    * the same predicate; the plan's file source lists just the
    * surviving files. With zero surviving files, returns an empty frame
    * with the table's schema (footer-only scan of `path`). */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
      statCol: String, lo: Column, hi: Column): DataFrame = {
    val files = overlapping(manifest, statCol, lo, hi)
      .select(col("file_path")).collect().map(_.getString(0)).sorted
    val residual = (c: Column) => c.between(lo, hi)
    if (files.isEmpty) spark.read.parquet(path).where(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).where(residual(col(statCol)))
  }
}
