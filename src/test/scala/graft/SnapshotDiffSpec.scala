package graft

import graft.ops.SnapshotDiff

class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  test("classifies added/removed/changed and drops unchanged rows") {
    val before = Seq(
      (1L, Some("a"), 10L), // unchanged
      (2L, Some("b"), 20L), // value change
      (3L, Some("c"), 30L), // removed
      (4L, None: Option[String], 40L) // null -> value: changed
    ).toDF("id", "s", "v")
    val after = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 21L), // two columns changed
      (4L, Some("now"), 40L),
      (5L, Some("new"), 50L) // added
    ).toDF("id", "s", "v")

    val got = SnapshotDiff.diff(before, after, Seq("id"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (2L, "changed", 2L),
      (3L, "removed", 0L),
      (4L, "changed", 1L),
      (5L, "added", 0L)))
  }

  test("null <=> null is unchanged; schema mismatch fails loudly") {
    val before = Seq((1L, None: Option[String])).toDF("id", "s")
    val after = Seq((1L, None: Option[String])).toDF("id", "s")
    assert(SnapshotDiff.diff(before, after, Seq("id")).count() == 0L)

    val other = Seq((1L, "x")).toDF("id", "t")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(before, other, Seq("id"))
    }
    assert(e.getMessage.contains("snapshot schemas differ"))
  }
}
