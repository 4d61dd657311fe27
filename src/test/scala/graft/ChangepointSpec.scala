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

  test("pettitt: step series splits at the step; doubled U matches the pair sum") {
    val df = ((0 to 3).map(b => ("s", b.toLong, 10L)) ++
      (4 to 7).map(b => ("s", b.toLong, 30L))).toDF("g", "bucket", "x")
    val r = Changepoint.pettitt(df, "g", "bucket", "x")
      .as[(String, Long, Long, Long)].head()
    // U_3 = 4·4 cross pairs, all +1 -> 16; doubled 32
    assert(r == (("s", 3L, 32L, 8L)))
  }

  test("pettitt: rank identity equals the brute-force sign sum on a tied series") {
    // pi digits — repeats (ties) exercise the mid-rank doubling
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val df = xs.zipWithIndex.map { case (x, b) => ("p", b.toLong, x) }
      .toDF("g", "bucket", "x")
    val got = Changepoint.pettitt(df, "g", "bucket", "x")
      .as[(String, Long, Long, Long)].head()
    // brute force over every split point
    val n = xs.length
    val brute = (0 until n).map { t =>
      val u2 = 2L * (for (i <- 0 to t; j <- (t + 1) until n)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      (t.toLong, u2)
    }
    val (bt, bu) = brute.maxBy { case (t, u) => (math.abs(u), -t) }
    assert(got == (("p", bt, bu, n.toLong)))
    assert(got._2 == 3L && got._3 == 34L) // pinned from the model
    // a constant series carries no signal: U = 0 everywhere, earliest wins
    val flat = (0 to 4).map(b => ("f", b.toLong, 5L)).toDF("g", "bucket", "x")
    val fr = Changepoint.pettitt(flat, "g", "bucket", "x")
      .as[(String, Long, Long, Long)].head()
    assert(fr == (("f", 0L, 0L, 5L)))
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
