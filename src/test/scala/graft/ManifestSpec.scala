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

  test("bloom manifest: no false negatives; absent keys prune; result exact") {
    // layout on id ranges, probes on k-values scattered across files —
    // the min/max envelope on a scattered column prunes nothing, the
    // bloom prunes by content
    val dir = writeRanged(1000, 4)
    val m = Manifest.bloomManifest(spark, dir, "s", mBits = 4096, nHashes = 4)
      .cache()
    // packed-word manifest stays tiny: <= ceil(4096/62) rows per file
    val perFile = m.groupBy("file_path").count().agg(max("count")).as[Long].head()
    assert(perFile <= 67L)

    // present key: its true file ALWAYS survives -> pruned read ≡ full filter
    val keys = Seq("v5", "v500", "v999", "vNOPE")
    val pruned = Manifest.bloomPrunedRead(spark, dir, m, "s", keys)
    val full = spark.read.parquet(dir).where(col("s").isin(keys: _*))
    assert(rowsOf(pruned.select("id", "k", "s")) == rowsOf(full.select("id", "k", "s")))
    assert(pruned.count() == 3L)

    // a key absent from the corpus survives (almost surely) no file at
    // mBits=4096 with ~250 keys/file — the probe prunes ALL files
    val nonePruned = Manifest.bloomPrunedRead(spark, dir, m, "s", Seq("wABSENT"))
    assert(nonePruned.count() == 0L)
    assert(Manifest.bloomMayContain(m,
      Seq("wABSENT").toDF("__probe"), "__probe", 4096, 4).count() == 0L)
  }

  test("overlapDepth: tiling ledger has depth 1, scattered ledger stacks up") {
    val tiled = Seq((0L, 0L, 9L), (1L, 10L, 19L), (2L, 20L, 29L))
      .toDF("file_id", "min_v", "max_v")
    val t = Manifest.overlapDepth(tiled, "file_id", "v")
      .as[(Long, Long)].collect().toMap
    assert(t == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))

    val scattered = Seq((0L, 0L, 100L), (1L, 5L, 50L), (2L, 60L, 70L))
      .toDF("file_id", "min_v", "max_v")
    val sc = Manifest.overlapDepth(scattered, "file_id", "v")
      .as[(Long, Long)].collect().toMap
    assert(sc == Map(0L -> 3L, 1L -> 2L, 2L -> 2L))

    // all-null envelopes (files with no non-null key) are excluded
    val withNull = Seq((0L, Some(0L), Some(9L)), (1L, None, None))
      .toDF("file_id", "min_v", "max_v")
    val n = Manifest.overlapDepth(withNull, "file_id", "v")
      .as[(Long, Long)].collect().toMap
    assert(n == Map(0L -> 1L))
  }

  test("bloom manifest: null keys set no bits and match no probe") {
    val dir = Files.createTempDirectory("graft_bloom_null").toString
    Seq[(Option[String], Long)]((None, 1L), (Some("x"), 2L)).toDF("s", "id")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val m = Manifest.bloomManifest(spark, dir, "s", mBits = 496, nHashes = 3)
    // probing the literal string "null" must not hit the null row's file
    // via any accidental bit from the null key
    val r = Manifest.bloomPrunedRead(spark, dir, m, "s", Seq("x"), 496, 3)
    assert(rowsOf(r) == Set(Vector("x", 2L)))
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
