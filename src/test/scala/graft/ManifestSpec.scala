package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Manifest

class ManifestSpec extends SparkSuite {
  import spark.implicits._

  private def writeRanged(n: Int, files: Int): String = {
    val dir = Files.createTempDirectory("graft_manifest").toString
    spark.range(n).select(col("id"),
        (col("id") % 7).as("k"), concat(lit("v"), col("id")).as("s"))
      .repartitionByRange(files, col("id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("build: one manifest row per file, exact count and min/max envelopes") {
    val dir = writeRanged(1000, 4)
    val m = Manifest.build(spark, dir, Seq("id", "k")).cache()
    assert(m.count() == 4L)
    assert(m.agg(sum("n_rows")).as[Long].head() == 1000L)
    // envelopes tile [0, 999] without gaps and without overlap
    val env = m.select("min_id", "max_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(env.head._1 == 0L && env.last._2 == 999L)
    env.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2)
    }
    // k cycles 0..6 everywhere, so every file's k-envelope is [0, 6]
    assert(rowsOf(m.select("min_k", "max_k")) == Set(Vector(0L, 6L)))
    m.unpersist()
  }

  test("prunedRead: equals the full filtered read while opening fewer files") {
    val dir = writeRanged(1000, 4)
    val m = Manifest.build(spark, dir, Seq("id"))
    val pruned = Manifest.prunedRead(spark, dir, m, "id", lit(100L), lit(180L))
    // result identical to scanning everything with the same predicate
    val full = spark.read.parquet(dir).where(col("id").between(100L, 180L))
    assert(rowsOf(pruned.select("id", "k", "s")) == rowsOf(full.select("id", "k", "s")))
    // and the scan's file list is actually pruned: an 81-id slice of a
    // 4-file range layout fits in 1-2 files
    val opened = pruned.select(col("_metadata.file_path")).distinct().count()
    assert(opened <= 2L, s"expected <= 2 files opened, got $opened")
    assert(Manifest.overlapping(m, "id", lit(100L), lit(180L)).count() <= 2L)
  }

  test("prunedRead: empty overlap returns an empty frame with the table schema") {
    val dir = writeRanged(100, 2)
    val m = Manifest.build(spark, dir, Seq("id"))
    val none = Manifest.prunedRead(spark, dir, m, "id", lit(5000L), lit(6000L))
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("id", "k", "s"))
  }

  test("all-null stat file is pruned; result still exact for range predicates") {
    val dir = Files.createTempDirectory("graft_manifest").toString
    Seq[(Option[Long], String)]((None, "a"), (None, "b")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/p0")
    Seq[(Option[Long], String)]((Some(1L), "c"), (Some(2L), "d")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/p1")
    val both = s"$dir/p*"
    val m = Manifest.build(spark, both, Seq("id"))
    val pruned = Manifest.prunedRead(spark, both, m, "id", lit(0L), lit(10L))
    assert(rowsOf(pruned) == Set(Vector(1L, "c"), Vector(2L, "d")))
    assert(Manifest.overlapping(m, "id", lit(0L), lit(10L)).count() == 1L)
  }
}
