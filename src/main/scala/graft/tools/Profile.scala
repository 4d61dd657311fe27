package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev utility: stage-by-stage timing of the MinHash near-dup pipeline.
  * Usage: sbt "runMain graft.tools.Profile [sfDir]" */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(tag: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE=$tag#$i ROWS=$n SECONDS=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    time("shingles")(Dedup.shingleTable(docs, "text", "doc_id", 3).count())
    time("signatures")(Dedup.minHashSignatures(docs, "text", "doc_id", 3, 64).count())
    time("candidates")(Dedup.minHashCandidates(docs, "text", "doc_id", 3, 64, 8, 100).count())
    time("full")(Dedup.minHashNearDups(docs, "text", "doc_id", 3, 64, 8, 0.5, 100).count())
    time("simhash_pairs")(
      Dedup.simHashNearDups(docs, "text", "doc_id", 3, 1000).count())
    time("components")(
      Dedup.connectedComponents(
        Dedup.simHashNearDups(docs, "text", "doc_id", 3, 1000), verbose = true).count())
    spark.stop()
  }
}
