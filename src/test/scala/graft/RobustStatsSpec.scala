package graft

import org.apache.spark.sql.functions._
import graft.ops.RobustStats

class RobustStatsSpec extends SparkSuite {
  import spark.implicits._

  test("medianX2: odd and even group sizes, exact integers") {
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val m = RobustStats.medianX2(df, "g", "v")
      .select("g", "n", "med_x2").as[(String, Long, Long)].collect()
      .map { case (g, n, x) => g -> ((n, x)) }.toMap
    assert(m("a") == ((3L, 6L)))  // median 3 -> 6
    assert(m("b") == ((4L, 5L)))  // median 2.5 -> 5, no division
  }

  test("medianMad matches hand-computed MAD on both parities") {
    // a: [1,3,5] med=3, devs [2,0,2] MAD=2 -> mad_x4=8
    // b: [1,2,3,4] med=2.5, devs [1.5,.5,.5,1.5] MAD=1 -> mad_x4=4
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = RobustStats.medianMad(df, "g", "v")
      .select("g", "med_x2", "mad_x4").as[(String, Long, Long)].collect()
      .map { case (g, m, d) => g -> ((m, d)) }.toMap
    assert(r("a") == ((6L, 8L)))
    assert(r("b") == ((5L, 4L)))
  }

  test("median shrugs off an outlier the mean cannot") {
    val base = (1L to 99L).map(("g", _))
    val df = (base :+ (("g", 1000000L))).toDF("g", "v")
    val r = RobustStats.medianMad(df, "g", "v")
      .select("med_x2", "mad_x4").as[(Long, Long)].head()
    // 100 values: middles are 50 and 51 -> med_x2 = 101
    assert(r._1 == 101L)
    // devs2 = |2v-101|: odd values 1..97 twice each, then 99, then the
    // outlier; sorted ranks 50,51 hold 49 and 51 -> mad_x4 = 100 (MAD 25)
    assert(r._2 == 100L)
    // windows stay partitioned: no global-funnel flags
    val flags = graft.tools.PlanAudit.flagsOf(
      RobustStats.medianMad(df, "g", "v").queryExecution.sparkPlan)
    assert(flags.isEmpty, flags.mkString(", "))
  }

  test("corrExact: perfect correlation, anti-correlation, exact moments") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L)
    ).toDF("g", "x", "y")
    val out = RobustStats.corrExact(df, "g", "x", "y")
      .select("g", "n", "sum_xy", "corr")
      .as[(String, Long, String, Double)].collect().map(r => r._1 -> r).toMap
    // the formula is deterministic, not algebraically simplified: the
    // double rounding of sqrt(a)*sqrt(b) leaves 1.0000000000000002 —
    // the same bits in both engines, which is the contract
    assert((out("up")._1, out("up")._2, out("up")._3) == (("up", 3L, "140")))
    assert(math.abs(out("up")._4 - 1.0) < 1e-12)
    assert(math.abs(out("down")._4 + 1.0) < 1e-12)
  }

  test("corrExact excludes pairs with either side null from every moment") {
    val df = Seq(
      ("g", Some(1L), Some(2L)), ("g", None, Some(9L)), ("g", Some(9L), None),
      ("g", Some(2L), Some(4L))
    ).toDF("g", "x", "y")
    val r = RobustStats.corrExact(df, "g", "x", "y")
      .select("n", "sum_x", "sum_y").as[(Long, String, String)].head()
    assert(r == ((2L, "3", "6")))
  }

  test("medianCiExact: order-statistic endpoints at the binomial ranks") {
    // n=9, values 10..90: median_x2 = 100; rlo = floor((9-5.88)/2) = 1
    // -> ci_lo 10; rhi = ceil((9+5.88)/2)+1 = 9 -> ci_hi 90
    val df = (1 to 9).map(i => ("a", i * 10L, i.toLong)).toDF("g", "v", "id")
    val r = RobustStats.medianCiExact(df, "g", "v", "id")
      .as[(String, Long, Long, Long, Long)].head()
    assert(r == (("a", 9L, 100L, 10L, 90L)))
  }

  test("trimmedMean drops exactly the k-tail order statistics per side") {
    // 1..9 plus outlier 1000 (n=10, k=1): keep ranks 2..9 = values 2..9
    // -> trimmed 5500 milli; the plain mean is dragged to 104500
    val df = ((1 to 9).map(i => ("a", i.toLong, i.toLong)) :+ (("a", 1000L, 10L)))
      .toDF("g", "v", "id")
    val r = RobustStats.trimmedMean(df, "g", "v", "id", trimMilli = 100)
      .as[(String, Long, Long, Long, Long)].head()
    assert(r == (("a", 10L, 104500L, 8L, 5500L)))
  }

  test("theilSenSlope shrugs off the outlier day OLS would chase") {
    // y = 10x on days 0..2, day 3 corrupted to 1000. Pairwise slopes:
    // 10,10,10 then 333.33/495/980 — lower median (rank 3 of 6) = 10.
    val df = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 1000L),
      ("b", 0L, 5L), ("b", 1L, 3L)).toDF("g", "x", "y")
    val m = RobustStats.theilSenSlope(df, "g", "x", "y")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("a") == ((6L, 10.0d)))
    assert(m("b") == ((1L, -2.0d))) // single pair: its slope IS the median
  }

  test("zscoreExact: hand values through the integer identity; constant strata null") {
    // a = (0,0,0,0,10): z = (5x-10)/sqrt(5*100-100) -> 40/20 = 2.0, -10/20 = -0.5
    val df = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 0L),
      ("a", 5L, 10L), ("c", 6L, 7L), ("c", 7L, 7L)).toDF("g", "id", "v")
    val m = RobustStats.zscoreExact(df, "g", "v")
      .select("id", "z").as[(Long, Option[Double])].collect().toMap
    assert(m(5L) == Some(2.0d) && m(1L) == Some(-0.5d))
    assert(m(6L).isEmpty && m(7L).isEmpty) // zero variance -> null, no raise
  }

  test("percentilesExact: lower exact percentile at ceil(q·n/1000), tie-deterministic") {
    // values 10..100 step 10 (n=10): p50 -> rank 5 -> 50; p90 -> rank 9
    // -> 90; p99 -> rank ceil(9.9)=10 -> 100; p1 -> rank max(1, ceil(0.1))=1
    val df = (1 to 10).map(i => ("a", i * 10L, i.toLong)).toDF("g", "v", "id")
    val out = RobustStats.percentilesExact(df, "g", "v", "id",
        qMillis = Seq(10, 500, 900, 990))
      .select("q_milli", "n", "value").as[(Int, Long, Long)].collect().toSet
    assert(out == Set((10, 10L, 10L), (500, 10L, 50L), (900, 10L, 90L),
      (990, 10L, 100L)))
  }

  test("mahalanobisDiag: hand-computed z² sum; constant columns contribute zero") {
    // a = (0,0,0,0,10): n=5, S=10, Q=100, den=400; z²(10) = 1000*1600/400
    // = 4000, z²(0) = 250. b constant -> zero variance -> 0, never a raise.
    val df = Seq((1L, 0L, 7L), (2L, 0L, 7L), (3L, 0L, 7L), (4L, 0L, 7L),
      (5L, 10L, 7L)).toDF("id", "a", "b")
    val out = RobustStats.mahalanobisDiag(df, "id", Seq("a", "b"), topN = 2)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq((5L, 4000L, "a", 4000L), (1L, 250L, "a", 250L)))
  }

  test("mahalanobisDiag: mildly-off-everywhere outranks extreme-in-one at equal totals") {
    // two informative columns; the row unusual in both collects both z²
    val df = Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L), (4L, 4L, 4L))
      .toDF("id", "a", "b")
    val top = RobustStats.mahalanobisDiag(df, "id", Seq("a", "b"), topN = 1)
      .as[(Long, Long, String, Long)].head()
    assert(top._1 == 4L && top._3 == "a" && top._2 == 2 * top._4)
  }

  test("powerSampleSize: hand-computed n per arm; degenerate strata report null") {
    // "a": x=(90,110) -> var 200, mean 100, delta 5 -> n = 2*7.84*200/25
    // = 125.44 -> ceil 126. "b": one row -> null. "z": sum 0 -> null.
    val df = Seq(("a", 90L), ("a", 110L), ("b", 7L), ("z", -5L), ("z", 5L))
      .toDF("g", "x")
    val m = RobustStats.powerSampleSize(df, "g", "x", mdeMilli = 50)
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("a") == ((2L, Some(100000L), Some(126L))))
    assert(m("b") == ((1L, Some(7000L), None)))
    assert(m("z") == ((2L, Some(0L), None)))
  }

  test("spearmanExact: monotone nonlinear is exactly 1; reversal is exactly -1") {
    val df = Seq((1L, 1L, 1L), (2L, 2L, 4L), (3L, 3L, 9L), (4L, 4L, 100L))
      .toDF("id", "x", "y")
    // rank-perfect despite the nonlinearity: the fixed expression shape is
    // num/(sqrt(den)*sqrt(den)), which is 1.0 only up to double rounding —
    // assert the exact same shape (cross-engine exactness is bit-identity
    // of this expression, not mathematical unity)
    val one = 80.0d / (math.sqrt(80.0d) * math.sqrt(80.0d))
    val up = RobustStats.spearmanExact(df, "id", "x", "y")
      .select("rho").as[Double].head()
    assert(up == one && math.abs(up - 1.0d) < 1e-12)
    val down = RobustStats.spearmanExact(
      df.withColumn("y", -col("y")), "id", "x", "y")
      .select("rho").as[Double].head()
    assert(down == -one)
  }

  test("spearmanExact: ties take average ranks (hand-computed sqrt(0.9) case)") {
    // x = (10,10,20,30) -> avg ranks (1.5,1.5,3,4); y = (1,2,3,4).
    // Pearson over 2x-ranks (3,3,6,8) vs (2,4,6,8) = 72/sqrt(72*80) = sqrt(0.9).
    val df = Seq((1L, 10L, 1L), (2L, 10L, 2L), (3L, 20L, 3L), (4L, 30L, 4L))
      .toDF("id", "x", "y")
    val r = RobustStats.spearmanExact(df, "id", "x", "y")
      .select("n", "sum_x", "sum_y", "rho")
      .as[(Long, String, String, Double)].head()
    assert(r._1 == 4L && r._2 == "20" && r._3 == "20")
    assert(r._4 == 72.0d / (math.sqrt(72.0d) * math.sqrt(80.0d)))
    assert(math.abs(r._4 - math.sqrt(0.9d)) < 1e-12)
  }

  test("winsorize clips to integer histogram-bin edges, exactly") {
    import org.apache.spark.sql.functions.col
    // 0,10,…,90 with 10 bins: p10 edge = 0, p90 edge = (8·90) div 10 = 72
    val df = (0 to 9).map(i => ("a", i * 10L)).toDF("g", "v")
    val out = RobustStats.winsorize(df, "g", "v", nBins = 10,
        qLo = 1 -> 10, qHi = 9 -> 10)
      .select("v", "clipped", "clip_dir")
      .as[(Long, Long, Long)].collect().toSet
    val want = (0 to 7).map(i => (i * 10L, i * 10L, 0L)).toSet ++
      Set((80L, 72L, 1L), (90L, 72L, 1L))
    assert(out == want)
  }

  test("winsorize strata are independent and the clipped column is bounded") {
    val df = ((1 to 50).map(i => ("x", i.toLong)) ++
      Seq(("x", 100000L)) ++ (1 to 50).map(i => ("y", i * 1000L))).toDF("g", "v")
    val out = RobustStats.winsorize(df, "g", "v", nBins = 64,
        qLo = 1 -> 20, qHi = 19 -> 20)
    import org.apache.spark.sql.functions.{col, max => smax, min => smin}
    val (loX, hiX) = out.where(col("g") === "x")
      .agg(smin("clipped"), smax("clipped")).as[(Long, Long)].head()
    // the 100000 outlier must be pulled down hard
    assert(hiX < 100000L && loX >= 1L)
    // no cross-stratum bleed: y's clip range reflects y's scale
    val hiY = out.where(col("g") === "y").agg(smax("clipped")).as[Long].head()
    assert(hiY > 40000L)
  }

  test("slopeExact: hand-computed slope; zero x-variance yields NaN") {
    // y = 3x + 1 exactly -> slope 3.0
    val lin = Seq(("a", 0L, 1L), ("a", 1L, 4L), ("a", 2L, 7L), ("a", 3L, 10L))
      .toDF("g", "x", "y")
    val s = graft.ops.RobustStats.slopeExact(lin, "g", "x", "y")
      .select("slope").as[Double].head()
    assert(s == 3.0d, s"got $s")
    // all x equal: 0/0 -> NaN (no trend defined), loud in any consumer
    val flat = Seq(("a", 5L, 1L), ("a", 5L, 9L)).toDF("g", "x", "y")
    val s2 = graft.ops.RobustStats.slopeExact(flat, "g", "x", "y")
      .select("slope").as[Double].head()
    assert(s2.isNaN, s"expected NaN for zero x-variance, got $s2")
    // null pairs are excluded from every moment
    val withNull = Seq(("a", Some(0L), Some(1L)), ("a", Some(1L), Some(4L)),
      ("a", None, Some(100L)), ("a", Some(9L), None)).toDF("g", "x", "y")
    val s3 = graft.ops.RobustStats.slopeExact(withNull, "g", "x", "y")
      .select("n", "slope").as[(Long, Double)].head()
    assert(s3 == ((2L, 3.0d)))
  }

  test("conformalCoverage: calibration coverage >= q by construction") {
    import graft.ops.RobustStats
    // adversarial residuals: heavy tail, ties, a zero
    val resid = (Seq(0L, 1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L, 1000L) ++
      (1 to 90).map(_.toLong * 7)).toDF("resid")
    for ((qn, qd) <- Seq(1 -> 2, 3 -> 4, 9 -> 10)) {
      val row = RobustStats.conformalCoverage(resid, resid, "resid", 64, qn, qd)
        .select("n_cal", "n_test", "covered", "coverage_milli")
        .as[(Long, Long, Long, Long)].head()
      assert(row._1 == 100L && row._2 == 100L)
      // threshold selected on this same set must cover >= qn/qd of it
      assert(row._3 * qd >= 100L * qn,
        s"calibration coverage ${row._3}/100 < $qn/$qd")
    }
  }

  test("conformalCoverage: threshold is the selected bin's upper edge, exactly applied") {
    import graft.ops.RobustStats
    // lo=0, hi=64, nBins=64 → bin width exactly 1; residuals 0..64
    val cal = (0L to 64L).toDF("resid")
    // q=1/2: rank = ceil(65/2) = 33 → 33rd residual (0-indexed 32) in
    // bin 32 → threshold upper edge = 33 (scaled: 0·64 + 33·64)
    val tst = Seq(32L, 33L, 34L).toDF("resid")
    val row = RobustStats.conformalCoverage(cal, tst, "resid", 64, 1, 2)
      .select("q_bin", "thr_scaled", "n_test", "covered", "coverage_milli")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(row._1 == 32L)
    assert(row._2 == 33L * 64)
    assert(row._4 == 2L, s"33 is covered (<= upper edge), 34 is not: $row")
    assert(row._5 == 666L)
  }

  test("conformalCoverage: constant residuals and empty test side") {
    import graft.ops.RobustStats
    val const = Seq.fill(5)(7L).toDF("resid")
    val row = RobustStats.conformalCoverage(const, Seq(7L, 8L).toDF("resid"),
        "resid", 64, 9, 10)
      .select("q_bin", "covered", "coverage_milli").as[(Long, Long, Long)].head()
    // hi == lo → bin 0, thr_scaled = 7·64 exactly: covers 7, not 8
    assert(row == ((0L, 1L, 500L)))
    val empty = RobustStats.conformalCoverage(const,
        Seq.empty[Long].toDF("resid"), "resid", 64, 9, 10)
      .select("n_test", "coverage_milli").as[(Long, Option[Long])].head()
    assert(empty == ((0L, None)))
  }

  test("didExact: hand-computed panel; an empty corner yields NULL, never zero") {
    // T pre [10,20] mean 15; T post [40]; C pre [5]; C post [10,20]
    // DiD = (40-15) - (15-5) = 15.0 — every mean exact in doubles
    val panel = Seq((1L, 0L, 10L), (1L, 0L, 20L), (1L, 1L, 40L),
      (0L, 0L, 5L), (0L, 1L, 10L), (0L, 1L, 20L))
      .toDF("treat", "post", "v").repartition(4)
    val r = RobustStats.didExact(panel, "treat", "post", "v")
      .select("n_t_pre", "s_t_pre", "n_c_post", "s_c_post", "did")
      .as[(Long, String, Long, String, Option[Double])].head()
    assert(r == ((2L, "30", 2L, "30", Some(15.0d))), s"got $r")
    // drop the control-pre corner: the design is undefined
    val hole = panel.where(!(col("treat") === 0L && col("post") === 0L))
    val d2 = RobustStats.didExact(hole, "treat", "post", "v")
      .select("did").as[Option[Double]].head()
    assert(d2.isEmpty)
    // a row with flags outside {0,1} belongs to no cell: raise, don't shrink
    val off = panel.unionByName(Seq((2L, 0L, 7L)).toDF("treat", "post", "v"))
    val e = intercept[Exception] {
      RobustStats.didExact(off, "treat", "post", "v").collect()
    }
    val full = { val sw = new java.io.StringWriter
      e.printStackTrace(new java.io.PrintWriter(sw)); sw.toString }
    assert(full.contains("outside {0,1}"), s"wrong failure: ${e.getMessage}")
  }
}
