package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private def run(a: Seq[(String, Long, Long)], b: Seq[(String, Long, Long)],
      bucketMs: Long) =
    Intervals.overlapJoin(
        a.toDF("aid", "a_start", "a_end").repartition(4),
        b.toDF("bid", "b_start", "b_end").repartition(3),
        "a_start", "a_end", "b_start", "b_end", bucketMs)
      .select("aid", "bid").as[(String, String)].collect().toSet

  test("overlapJoin: basic overlaps, half-open ends excluded") {
    val a = Seq(("a1", 0L, 10L), ("a2", 10L, 20L), ("a3", 35L, 36L))
    val b = Seq(("b1", 5L, 12L), ("b2", 20L, 30L), ("b3", 36L, 40L))
    // a1-b1 (5..10), a2-b1 (10..12); a2-b2 touch at 20 -> excluded;
    // a3-b3 touch at 36 -> excluded
    assert(run(a, b, 4L) == Set(("a1", "b1"), ("a2", "b1")))
  }

  test("overlapJoin: a pair spanning many shared buckets matches exactly once") {
    val a = Seq(("a1", 0L, 100L))
    val b = Seq(("b1", 3L, 97L), ("b2", 50L, 200L))
    val out = Intervals.overlapJoin(
      a.toDF("aid", "a_start", "a_end"), b.toDF("bid", "b_start", "b_end"),
      "a_start", "a_end", "b_start", "b_end", bucketMs = 7L)
    // 14+ shared buckets each, but one output row per qualifying pair
    assert(out.select("aid", "bid").as[(String, String)].collect().sorted.toSeq
      == Seq(("a1", "b1"), ("a1", "b2")))
  }

  test("overlapJoin: empty/inverted intervals drop out; matches theta join") {
    val a = Seq(("a1", 5L, 5L), ("a2", 9L, 3L), ("a3", 1L, 50L))
    val b = Seq(("b1", 4L, 6L), ("b2", 49L, 60L), ("b3", 50L, 55L))
    assert(run(a, b, 10L) == Set(("a3", "b1"), ("a3", "b2")))
    // cross-check against the naive theta join on the same data
    val naive = a.toDF("aid", "a_start", "a_end")
      .join(b.toDF("bid", "b_start", "b_end"),
        col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .where(col("a_end") > col("a_start") && col("b_end") > col("b_start"))
      .select("aid", "bid").as[(String, String)].collect().toSet
    assert(run(a, b, 3L) == naive)
  }

  test("overlapJoin: rejects colliding column names and bad bucket") {
    val a = Seq(("x", 1L, 2L)).toDF("id", "s", "e")
    val b = Seq(("y", 1L, 2L)).toDF("id", "s2", "e2")
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(a, b, "s", "e", "s2", "e2", 10L)
    }
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(a, b.withColumnRenamed("id", "id2"),
        "s", "e", "s2", "e2", 0L)
    }
  }

  test("overlapJoin: rejects bound column names that would not parse as identifiers") {
    val a = Seq(("x", 1L, 2L)).toDF("id", "s end", "e")
    val b = Seq(("y", 1L, 2L)).toDF("id2", "s2", "e2")
    val err = intercept[IllegalArgumentException] {
      Intervals.overlapJoin(a, b, "s end", "e", "s2", "e2", 10L)
    }
    assert(err.getMessage.contains("s end"))
  }

  test("peakConcurrency: hand-swept maximum and its earliest instant") {
    // [0,10] [5,20] [15,30]: at t=5 two open; 10 closes before 15 opens
    // -> peak 2, first reached at t=5
    val iv = Seq((0L, 10L), (5L, 20L), (15L, 30L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e")
      .as[(Long, Long)].head()
    assert(out == ((2L, 5L)))
  }

  test("peakConcurrency: closed intervals — touching counts as overlap") {
    // [0,10] and [10,20] touch at 10: starts apply before ends, so both
    // are open at t=10. A third [10,10] point-interval joins them -> 3
    val iv = Seq((0L, 10L), (10L, 20L), (10L, 10L)).toDF("s", "e")
    val out = Intervals.peakConcurrency(iv, "s", "e")
      .as[(Long, Long)].head()
    assert(out == ((3L, 10L)))
  }
}
