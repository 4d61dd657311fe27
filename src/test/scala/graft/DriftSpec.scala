package graft

import org.apache.spark.sql.functions._
import graft.ops.{Drift, Sketches}

class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("profile: exact null rates; sketch distinct matches the direct sketch") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val p = Drift.profile(df, Seq("id", "s"))
      .select("col_name", "n_rows", "n_null", "null_milli", "s_scaled")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(p("id")._1 == 4L && p("id")._2 == 0L && p("id")._3 == 0L)
    assert(p("s")._1 == 4L && p("s")._2 == 1L && p("s")._3 == 250L)
    // the sketch ran over stringified values — same registers as a
    // direct single-column sketch
    val direct = Sketches.hllEstimate(
      df.where($"s".isNotNull).select(lit("s").as("g"), $"s".cast("string").as("v")),
      "g", col("v")).select("s_scaled").as[Long].head()
    assert(p("s")._4 == direct)
  }

  test("profile: an entirely-null column reports distinct 0, not a missing row") {
    val df = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "s")
    val p = Drift.profile(df, Seq("s"))
      .select("null_milli", "s_scaled", "raw_estimate")
      .as[(Long, Long, Double)].head()
    assert(p == ((1000L, 0L, 0.0)))
  }

  test("drift: added/removed/common statuses and exact null-rate deltas") {
    val before = Seq((1L, Some("x"), "k"), (2L, None: Option[String], "k"))
      .toDF("id", "s", "gone")
    val after = Seq((1L, None: Option[String], 7L), (2L, None, 8L))
      .toDF("id", "s", "fresh")
    val d = Drift.drift(
        Drift.profile(before, Seq("id", "s", "gone")),
        Drift.profile(after, Seq("id", "s", "fresh")))
      .select("col_name", "status", "null_milli_delta")
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d("id") == (("common", 0L)))
    assert(d("s") == (("common", 500L))) // 500 -> 1000
    assert(d("gone")._1 == "removed")
    assert(d("fresh")._1 == "added")
  }
}
