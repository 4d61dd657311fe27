package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-probe: times the bare co-occurrence edge build (the
  * subtree every louvain/graph query starts from) at the session's core
  * count, twice, so the steady-state cost is visible without the rest of
  * the query. Usage: SPARK_GRAFT_CPUS=N sbt 'runMain graft.tools.EdgeProbe [sfDir]' */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.coOccurrenceEdges(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_orderkey", "l_partkey")
        .count()
      println(f"EDGEPROBE pass=$pass cpus=$cpus rows=$n " +
        f"SECONDS=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
