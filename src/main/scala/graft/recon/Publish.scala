package graft.recon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileContext, Options, Path}

/**
 * Two-phase atomic publish — the crash-safety contract behind the
 * reference's temp-collection dance (second_conciliate.py:405-447: write
 * to a TEMP collection, `$merge` into the final one, drop temp; a crash
 * mid-write must never leave readers a half-populated result).
 *
 * File-store version of the same contract, manifest-flip style:
 *
 *   phase 1 (WRITE):    the result lands in `root/v=N` — a fresh
 *                       directory no reader resolves; N = 1 + the highest
 *                       version on disk, so orphans from crashed runs are
 *                       skipped, never reused.
 *   validate:           the caller's check runs against a RE-READ of the
 *                       written files (what readers would actually see,
 *                       not the in-memory frame); failure deletes the
 *                       version dir and rethrows — the pointer is never
 *                       touched.
 *   phase 2 (PROMOTE):  a one-line pointer file `root/_CURRENT` is
 *                       replaced via FileContext.rename(OVERWRITE) — a
 *                       single atomic metadata operation on HDFS and on
 *                       posix local filesystems. Readers resolve the
 *                       pointer first, so they see the OLD version up to
 *                       the rename and the NEW one after it; there is no
 *                       instant at which a partial result is visible.
 *
 * A crash anywhere in phase 1 leaves an orphan `v=N` directory and the
 * pointer untouched (readers unaffected; the next publish writes `v=N+1`);
 * a crash before the rename is the same; the rename itself is atomic.
 * Old versions stay on disk for time-travel/debugging until [[prune]].
 */
object Publish {

  private val Pointer = "_CURRENT"
  private val VersionPrefix = "v="

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionDir(root: String, v: Long) = new Path(root, s"$VersionPrefix$v")

  /** All version numbers present on disk — INCLUDING orphans from
    * crashed phase-1 writes (which is why the next version must be
    * max+1, not pointer+1). */
  private[graft] def versionsOnDisk(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(VersionPrefix) => n.drop(VersionPrefix.length) }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
  }

  /** The version readers currently resolve, if anything was ever
    * promoted. Reads the pointer file, never the directory listing. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, Pointer)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](64)
        val n = in.read(bytes)
        // a zero-byte pointer is corruption, not "nothing published" —
        // fail loudly rather than silently hiding a promoted version
        require(n > 0, s"Publish: pointer file $p is empty/corrupt")
        Some(new String(bytes, 0, n, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** The currently-promoted result. Fails loudly when nothing was ever
    * promoted — an empty frame here would read as "published empty". */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"Publish.readCurrent: nothing promoted at $root"))
    spark.read.parquet(versionDir(root, v).toString)
  }

  /** Phase 1 alone (exposed so the crash-window spec can kill the job
    * between write and promote): write `df` as the next version, return
    * its number. The pointer is NOT touched. */
  private[graft] def writeVersion(df: DataFrame, root: String): Long = {
    val next = (versionsOnDisk(df.sparkSession, root) :+ 0L).max + 1
    df.write.parquet(versionDir(root, next).toString)
    next
  }

  /** Phase 2 alone: atomically point readers at `version`. The pointer
    * replace is ONE FileContext.rename(OVERWRITE) — atomic on HDFS and
    * posix; the temp pointer is version-suffixed so two concurrent
    * publishers never scribble on each other's temp file (last rename
    * wins the pointer, both versions are fully on disk). */
  private[graft] def flip(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"$Pointer.tmp.$version")
    val out = f.create(tmp, true)
    try out.write(s"$version\n".getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(tmp.toUri, spark.sessionState.newHadoopConf())
    fc.rename(fc.makeQualified(tmp),
      fc.makeQualified(new Path(root, Pointer)), Options.Rename.OVERWRITE)
  }

  /**
   * The full two-phase publish: write → validate the re-read → promote.
   * Returns the promoted version. `validate` defaults to a non-empty
   * check; throw from it to abort (the version dir is deleted, the
   * pointer — and therefore every reader — is untouched).
   */
  def publish(df: DataFrame, root: String,
      validate: DataFrame => Unit = d =>
        require(d.head(1).nonEmpty, "publish validation: result is empty")): Long = {
    val spark = df.sparkSession
    val v = writeVersion(df, root)
    val dir = versionDir(root, v)
    try validate(spark.read.parquet(dir.toString))
    catch {
      case e: Throwable =>
        fs(spark, root).delete(dir, true)
        throw e
    }
    flip(spark, root, v)
    v
  }

  /** Drop all versions older than the newest `keep` PROMOTED-or-newer
    * versions, never the current one — the GC that keeps the version
    * ladder bounded. Orphans below the cut are removed too. */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, s"keep must be >= 1: $keep")
    val cur = currentVersion(spark, root)
    val all = versionsOnDisk(spark, root).sorted(Ordering[Long].reverse)
    val f = fs(spark, root)
    all.drop(keep).filterNot(cur.contains).foreach(v =>
      f.delete(versionDir(root, v), true))
  }
}
