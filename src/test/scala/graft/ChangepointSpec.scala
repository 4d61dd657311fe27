package graft

import graft.ops.Changepoint

class ChangepointSpec extends SparkSuite {
  import spark.implicits._

  test("maxCusum finds the regime shift of a step series at the step") {
    // series s: 10,10,10,10 then 30,30,30,30 — mean 20; CUSUM of
    // scaled deviations peaks (in |.|) at the last low bucket (index 3)
    val df = ((0 to 3).map(b => ("s", b.toLong, 10L)) ++
      (4 to 7).map(b => ("s", b.toLong, 30L))).toDF("g", "bucket", "x")
    val r = Changepoint.maxCusum(df, "g", "bucket", "x")
      .as[(String, Long, Long, Long, Long)].head()
    // dev_i = x_i*8 - 160: low buckets -80 each; cusum at bucket 3 = -320
    assert(r == (("s", 3L, -320L, 8L, 160L)))
  }

  test("a flat series peaks at the first bucket with cusum 0 (tie-break earliest)") {
    val df = (0 to 4).map(b => ("f", b.toLong, 7L)).toDF("g", "bucket", "x")
    val r = Changepoint.maxCusum(df, "g", "bucket", "x")
      .as[(String, Long, Long, Long, Long)].head()
    assert(r == (("f", 0L, 0L, 5L, 35L)))
  }

  test("series are independent") {
    val df = (Seq(("a", 0L, 1L), ("a", 1L, 9L)) ++
      (0 to 3).map(b => ("b", b.toLong, 5L))).toDF("g", "bucket", "x")
    val m = Changepoint.maxCusum(df, "g", "bucket", "x")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(m == Map("a" -> 0L, "b" -> 0L))
  }
}
