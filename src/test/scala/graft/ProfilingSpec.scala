package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiling

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew ranks the heaviest keys with exact shares") {
    val df = (Seq.fill(6)("hub") ++ Seq.fill(3)("mid") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val top = Profiling.keySkew(df, Seq("k"), topN = 2)
      .select("k", "n", "share").as[(String, Long, Double)].collect().toSeq
    assert(top == Seq(("hub", 6L, 0.5), ("mid", 3L, 0.25)))
  }

  test("keySkew tie-break and cut are deterministic on any layout") {
    val df = Seq("b", "a", "c", "a", "b", "c").toDF("k").repartition(7)
    val top = Profiling.keySkew(df, Seq("k"), topN = 2)
      .select("k").as[String].collect().toSeq
    assert(top == Seq("a", "b")) // all tied at 2 → key order decides
  }

  private def concRow(df: org.apache.spark.sql.DataFrame) =
    Profiling.concentration(df, Seq("k"))
      .select("n_keys", "total_rows", "gini_milli",
        "top_decile_share_milli", "max_key_share_milli")
      .as[(Long, Long, Long, Long, Long)].head()

  test("concentration: uniform distribution has Gini exactly 0") {
    // 4 keys x 3 rows: G = (2*30 - 5*12)/(4*12) = 0; max share 3/12
    val df = Seq("a", "b", "c", "d").flatMap(k => Seq.fill(3)(k)).toDF("k")
    assert(concRow(df) == ((4L, 12L, 0L, 0L, 250L)))
  }

  test("concentration: hand-computed skew, layout-independent") {
    // counts (1,1,2,6): S=10, ranks asc -> S1=33, G=(66-50)/40=0.4
    val df = (Seq("a") ++ Seq("b") ++ Seq.fill(2)("c") ++ Seq.fill(6)("d"))
      .toDF("k").repartition(7)
    assert(concRow(df) == ((4L, 10L, 400L, 0L, 600L)))
  }

  test("concentration: top-decile share counts exactly floor(n/10) keys") {
    // keys k01..k10 with count i: S=55, S1=sum(i^2)=385,
    // G=(770-605)/550 -> 300 milli; top decile = the single heaviest
    // key (10 rows) -> 10000 div 55 = 181 milli, same as max share
    val df = (1 to 10).flatMap(i => Seq.fill(i)(f"k$i%02d")).toDF("k")
    assert(concRow(df) == ((10L, 55L, 300L, 181L, 181L)))
  }

  test("cramersV: perfect dependence scores 1, independence scores 0, zero cells appear") {
    // perfect: a determines b, 2x2, balanced
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val depRows = Profiling.cramersV(dep, "a", "b").collect()
    assert(depRows.length == 4) // 2x2 including the two zero cells
    assert(depRows.forall(r => r.getAs[Double]("cramers_v") == 1.0))
    val zeros = depRows.filter(_.getAs[Long]("n_obs") == 0L)
    assert(zeros.length == 2 && zeros.forall(_.getAs[Long]("exp_milli") == 5000L))
    // independence: every (a, b) combination equally likely
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val indRows = Profiling.cramersV(ind, "a", "b").collect()
    assert(indRows.forall(r => r.getAs[Double]("cramers_v") == 0.0))
    assert(indRows.forall(r => r.getAs[Long]("contrib_milli") == 0L))
    assert(indRows.forall(r => r.getAs[Long]("exp_milli") == 5000L))
  }

  test("cramersV: over-cap contingency grid fails loudly; dof-0 V is null") {
    // 50x40 = 2000 cells > maxCells=1000 -> in-plan raise BEFORE the
    // grid streams (high-cardinality misuse must not materialize r*c rows)
    val big = spark.range(0, 2000)
      .selectExpr("cast(id % 50 as string) a", "cast(id % 40 as string) b")
    val e = intercept[Exception] {
      Profiling.cramersV(big, "a", "b", maxCells = 1000).collect()
    }
    val full = { val sw = new java.io.StringWriter
      e.printStackTrace(new java.io.PrintWriter(sw)); sw.toString }
    assert(full.contains("contingency grid exceeds"), s"wrong failure: ${e.getMessage}")
    // a single-category column has dof 0: V undefined -> guarded null
    val single = Seq(("x", "p"), ("x", "q"), ("x", "p")).toDF("a", "b")
    val rows = Profiling.cramersV(single, "a", "b").collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(rows.head.fieldIndex("cramers_v"))))
  }

  test("keyMultiplicity bands keys by carried rows at the band edges") {
    val rows = Seq.fill(1)("a") ++ Seq.fill(10)("b") ++ Seq.fill(11)("c") ++
      Seq.fill(100)("d") ++ Seq.fill(101)("e")
    val out = graft.ops.Profiling.keyMultiplicity(rows.toDF("k"), "k", "s")
      .as[(String, String, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(out == Map(
      "1" -> ((1L, 1L)), "2-10" -> ((1L, 10L)),
      "11-100" -> ((2L, 111L)), "100+" -> ((1L, 101L))))
  }

  test("effectiveCount: skewed keys collapse toward 1, uniform keys count fully") {
    val df = (Seq.fill(9)(("x", "a")) ++ Seq(("x", "b")) ++
      Seq.fill(5)(("u", "a")) ++ Seq.fill(5)(("u", "b"))).toDF("g", "k")
    val m = graft.ops.Profiling.effectiveCount(df, "g", "k")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("x") == ((10L, 2L, 1219L))) // 100000 // 82
    assert(m("u") == ((10L, 2L, 2000L))) // exactly 2 effective keys
  }

  test("diurnality: uniform profile scores 0; a one-hour spike is hand-computable") {
    import java.sql.Timestamp
    def at(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:30:00")
    // "flat": one event in each of 24 hours -> chi2 = 0, peak share 41
    val flat = (0 until 24).map(h => ("flat", at(1 + h / 24, h % 24)))
    // "spike": 8 events all at hour 7 -> present h=1: (24*8-8)^2 = 184^2
    // = 33856; absent 23 hours: 23*64 = 1472 -> (1000*35328)//(24*8) = 184000
    val spike = (1 to 8).map(i => ("spike", at(i, 7)))
    val df = (flat ++ spike).toDF("g", "ts")
    val m = graft.ops.Profiling.diurnality(df, "g", "ts")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m("flat") == ((24L, 0L, 0L, 41L))) // peak ties -> smallest hour
    assert(m("spike") == ((8L, 184000L, 7L, 1000L)))
  }

  test("arrivalRegularity: clockwork = zero CV² and full gap reuse; bursts score high") {
    import java.sql.Timestamp
    def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    val df = (
      // bot: every 10s exactly -> gaps (10,10,10)s: cv2 0, dup 1000-333=667
      Seq(("bot", t(0), 1L), ("bot", t(10), 2L), ("bot", t(20), 3L), ("bot", t(30), 4L)) ++
      // human: gaps (1, 99)s -> mean 50, var pop 2401 -> cv2 = 960 (milli floor)
      Seq(("hum", t(0), 5L), ("hum", t(1), 6L), ("hum", t(100), 7L)) ++
      // singleton: no gaps -> absent from the report
      Seq(("one", t(0), 8L))
    ).toDF("u", "ts", "id")
    val m = graft.ops.Profiling.arrivalRegularity(df, "u", "ts", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))).toMap
    assert(m("bot") == ((3L, Some(0L), 667L)))
    // n*sg2 - sg^2 = 2*(1+9801)e12 - (100e6)^2 ... exact: gaps us = (1e6, 99e6):
    // n=2, sg=1e8, sg2=1e12+9801e12=9802e12; 2*9802e12-1e16=9604e12;
    // 1000*9604e12 div 1e16 = 960
    assert(m("hum") == ((2L, Some(960L), 0L)))
    assert(!m.contains("one"))
  }

  private def kappaRow(df: org.apache.spark.sql.DataFrame) =
    Profiling.cohenKappaMilli(df, col("a"), col("b"))
      .select("n", "n_agree", "n_pos_a", "n_pos_b", "po_milli", "kappa_milli")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()

  test("cohenKappaMilli: hand-computed 2x2, layout-independent") {
    // A+ rows 1-6, B+ rows 1-4 and 7: agree=7, r1=6, c1=5
    // q = 6*5 + 4*5 = 50; kappa = 1000*(70-50)/(100-50) = 400
    val df = (1L to 10L).map(i => (i <= 6L, i <= 4L || i == 7L))
      .toDF("a", "b").repartition(5)
    assert(kappaRow(df) == ((10L, 7L, 6L, 5L, Some(700L), Some(400L))))
  }

  test("cohenKappaMilli: perfect agreement 1000, inversion -1000") {
    val same = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    assert(kappaRow(same)._6 == Some(1000L))
    val inv = Seq((true, false), (false, true)).toDF("a", "b")
    assert(kappaRow(inv) == ((2L, 0L, 1L, 1L, Some(0L), Some(-1000L))))
  }

  test("cohenKappaMilli: both judges constant => kappa NULL, never a division error") {
    // pe = 1 exactly iff both marginals sit at n (or both at 0) — the
    // undefined case; a 0/0 that 'ran' would report spurious perfection
    val allT = Seq((true, true), (true, true)).toDF("a", "b")
    assert(kappaRow(allT) == ((2L, 2L, 2L, 2L, Some(1000L), None)))
    // ONE constant judge is NOT degenerate: A always true, B mixed
    // agree=1, r1=2, c1=1, q=2, kappa = 1000*(2*1-2)/(4-2) = 0
    val oneConst = Seq((true, true), (true, false)).toDF("a", "b")
    assert(kappaRow(oneConst) == ((2L, 1L, 2L, 1L, Some(500L), Some(0L))))
  }

  test("cohenKappaMilli raises on a NULL verdict instead of silently skipping") {
    val df = Seq((Some(true), Some(true)), (None, Some(false)))
      .toDF("a", "b")
    val e = intercept[Exception] { kappaRow(df) }
    val full = { val sw = new java.io.StringWriter
      e.printStackTrace(new java.io.PrintWriter(sw)); sw.toString }
    assert(full.contains("NULL judge-A verdict"), s"wrong failure: ${e.getMessage}")
  }
}
