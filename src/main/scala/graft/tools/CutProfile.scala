package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the Louvain BUILD cost: times each construction
  * phase of graph_louvain_coarse's plan (cuts included) separately.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CutProfile [sfDir]" */
object CutProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Warmup.warmJvm(spark)
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t = System.nanoTime()
      println(f"LAP $tag%-28s ${(t - t0) / 1e9}%7.2f s")
      t0 = t
    }
    import graft.ops.Graph
    import graft.recon.Checkpoints.cut
    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      t0 = System.nanoTime()
      val edges0 = Graph.coOccurrenceEdges(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_orderkey", "l_partkey")
      lap("edges plan")
      val edges = cut(edges0)
      lap("edges cut")
      val l1 = Graph.louvainMove(edges, rounds = 2)
      lap("louvainMove(2) build")
      val wE0 = Graph.contractGraph(edges, l1)
      lap("contract plan")
      val wE = cut(wE0)
      lap("contract cut")
      val l2s = Graph.louvainMoveWeighted(wE, rounds = 2, cutRounds = true)
        .select(col("node").as("label"), col("label").as("__final"))
      lap("weighted(2) build")
      val fin = l1.join(l2s, Seq("label"))
        .select(col("node"), col("__final").as("label"))
      val q = Graph.modularityMicro(edges, fin)
      lap("modularity build")
      val n = q.count()
      lap(s"RUN (rows=$n)")
    }
    spark.stop()
  }
}
