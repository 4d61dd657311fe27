package graft.recon

import org.apache.spark.sql.DataFrame

/**
 * Lineage-cut policy for the engine's load-bearing materialization points
 * (pre-fan-out shingle tables, per-pass remanents, pre-sort candidate
 * sets). Catalyst re-executes a subplan once per consumer and
 * ReuseExchange only dedups identical exchanges, so these cuts are
 * correctness-of-cost, not correctness-of-result.
 *
 * Two modes:
 *  - default: `localCheckpoint(eager)` — blocks stay on executor local
 *    storage. Fastest, but non-replicated: on a real cluster an executor
 *    loss past the cut fails the job.
 *  - `spark.graft.checkpointDir` set: reliable `checkpoint()` into that
 *    (HDFS/object-store) directory — survives executor loss, the right
 *    setting for long multi-pass runs at the 100 TB scale. The directory
 *    is installed as the SparkContext checkpoint dir on first use, and the
 *    per-app UUID subdir is deleted at application end (multi-pass runs
 *    lay down one checkpoint per cut — without cleanup they accumulate
 *    unboundedly). For mid-run reclamation of checkpoints whose frames
 *    have been GC'd, additionally submit with
 *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (read at
 *    SparkContext construction — cannot be installed here).
 */
object Checkpoints {

  final val DirConf = "spark.graft.checkpointDir"

  private val cleanupHooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Delete the per-app checkpoint subdir when the application ends. */
  private def hookCleanup(sc: org.apache.spark.SparkContext): Unit =
    if (cleanupHooked.compareAndSet(false, true)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          sc.getCheckpointDir.foreach { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            try p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
            catch { case _: java.io.IOException => () } // best-effort
          }
      })
    }

  /** Materialize `df` eagerly and cut its lineage, per the session's
    * checkpoint policy. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // setCheckpointDir stores a fully-QUALIFIED path ("file:/…",
        // "hdfs://…") plus a per-app UUID subdir — qualify the configured
        // dir the same way before the prefix check, or every cut would
        // install a fresh subdir
        val p = new org.apache.hadoop.fs.Path(dir)
        val qualified = p.getFileSystem(sc.hadoopConfiguration)
          .makeQualified(p).toString
        if (!sc.getCheckpointDir.exists(_.startsWith(qualified))) sc.setCheckpointDir(dir)
        hookCleanup(sc)
        df.checkpoint(eager = true)
      case _ =>
        df.localCheckpoint(eager = true)
    }
  }
}
