package graft.tools

import org.apache.spark.sql.SparkSession

/** Paired in-session A/B of the round-15 triangle/clustering rewrite:
  * the SYMMETRIC form (`triangleCounts(coOccurrenceEdges(...))`) vs the
  * CANONICAL half-list form
  * (`triangleCountsCanonical(coOccurrenceCanonicalEdges(...))`). The
  * `spark.graft.edgesLegacy` conf only gates the edge BUILD, not these
  * call sites, so ConfAB cannot adjudicate them — this probe times both
  * expressions back to back in one session (load noise hits both arms).
  *
  * Usage: SPARK_GRAFT_CPUS=N sbt 'runMain graft.tools.TriProbe [sfDir] [reps]' */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Warmup.warmJvm(spark)
    import graft.ops.Graph
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def once(tag: String, df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      s
    }
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to reps) {
      val arms = Seq(
        "tri_sym" -> (() => Graph.triangleCounts(
          Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))),
        "tri_canon" -> (() => Graph.triangleCountsCanonical(
          Graph.coOccurrenceCanonicalEdges(li, "l_orderkey", "l_partkey"))),
        "clu_sym" -> (() => Graph.clusteringCoefficients(
          Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))),
        "clu_canon" -> (() => Graph.clusteringCoefficientsCanonical(
          Graph.coOccurrenceCanonicalEdges(li, "l_orderkey", "l_partkey"))))
      val order = if (r % 2 == 1) arms else arms.reverse
      order.foreach { case (tag, mk) =>
        val s = once(tag, mk())
        acc(tag) = s :: acc(tag)
        println(f"TRIPROBE rep=$r $tag%-10s $s%6.2f s")
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (t, ss) =>
      println(f"TRIPROBE MIN $t%-10s ${ss.min}%6.2f s  reps=${ss.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
