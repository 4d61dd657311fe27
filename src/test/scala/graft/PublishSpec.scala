package graft

import org.apache.spark.sql.functions._
import graft.recon.Publish

/** Two-phase publish crash-safety: a job killed between write and
  * promote, or failing validation, must leave readers on the previous
  * version — never a half-published or empty result. */
class PublishSpec extends SparkSuite {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_publish").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("publish → readCurrent round-trips; re-publish supersedes atomically") {
    val root = tmpRoot()
    assert(Publish.currentVersion(spark, root).isEmpty)
    intercept[IllegalStateException](Publish.readCurrent(spark, root))
    val v1 = Publish.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    assert(v1 == 1L && Publish.currentVersion(spark, root).contains(1L))
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    val v2 = Publish.publish(Seq((3L, "c")).toDF("id", "x"), root)
    assert(v2 == 2L)
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
  }

  test("crash window: a write WITHOUT promote is invisible; the next publish skips it") {
    val root = tmpRoot()
    Publish.publish(Seq((1L, "a")).toDF("id", "x"), root)
    // the job dies between phase 1 and phase 2: version 2 is fully on
    // disk but the pointer was never flipped
    val orphan = Publish.writeVersion(Seq((9L, "half")).toDF("id", "x"), root)
    assert(orphan == 2L)
    assert(Publish.currentVersion(spark, root).contains(1L))
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a"))) // readers never see the orphan
    // the NEXT publish must not reuse the orphan's number (a retry that
    // appended into v=2 would publish a mixed result)
    val v3 = Publish.publish(Seq((7L, "next")).toDF("id", "x"), root)
    assert(v3 == 3L)
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((7L, "next")))
    assert(Publish.versionsOnDisk(spark, root).sorted == Seq(1L, 2L, 3L))
  }

  test("validation failure aborts BEFORE promote: pointer and readers untouched") {
    val root = tmpRoot()
    Publish.publish(Seq((1L, "a")).toDF("id", "x"), root)
    // default validator: an empty result must not replace a good one
    val empty = Seq((1L, "a")).toDF("id", "x").where(lit(false))
    intercept[IllegalArgumentException](Publish.publish(empty, root))
    assert(Publish.currentVersion(spark, root).contains(1L))
    // custom validator sees the RE-READ files, and its failure deletes
    // the version dir (no orphan accumulates for a rejected result)
    intercept[IllegalStateException] {
      Publish.publish(Seq((2L, "bad")).toDF("id", "x"), root,
        validate = d => {
          assert(d.count() == 1L) // the re-read is the written data
          throw new IllegalStateException("row count drifted vs yesterday")
        })
    }
    assert(Publish.versionsOnDisk(spark, root).sorted == Seq(1L))
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
  }

  test("prune keeps the newest versions and never the current one") {
    val root = tmpRoot()
    (1 to 4).foreach(i => Publish.publish(Seq((i.toLong, s"r$i")).toDF("id", "x"), root))
    Publish.prune(spark, root, keep = 2)
    assert(Publish.versionsOnDisk(spark, root).sorted == Seq(3L, 4L))
    assert(Publish.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((4L, "r4")))
  }
}
