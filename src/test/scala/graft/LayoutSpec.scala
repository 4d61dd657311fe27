package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables sort-merge-join with zero exchanges") {
    val facts = (1L to 2000L).map(k => (k % 97, k)).toDF("key", "payload")
    val dim = (0L to 96L).map(k => (k, s"d$k")).toDF("key", "name")
    Layout.writeBucketed(facts, "graft_spec_facts", Seq("key"), buckets = 8)
    Layout.writeBucketed(dim, "graft_spec_dim", Seq("key"), buckets = 8)

    val joined = Layout.bucketedJoin(spark, "graft_spec_facts", "graft_spec_dim", Seq("key"))
    // plan shape: the merge join must be satisfied by the bucketed scans
    // directly — no ShuffleExchange anywhere under the join. Inspect the
    // pre-adaptive physical plan (AQE wraps the executed plan in a leaf)
    val plan = joined.queryExecution.sparkPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
    assert(exchanges.isEmpty, s"bucketed join must not shuffle:\n$plan")

    // and bucketing never changes values: equals the plain join
    val got = joined.select("key", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val want = facts.join(dim, "key").select("key", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(got == want && got.size == 2000)
  }

  test("compactionPlan: cumulative-quota bins on hand-sized inventories") {
    // pre-sums 0,10,20,30 at target 25 -> bins 0,0,0,1
    val u1 = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("k", "bytes")
    val got1 = Layout.compactionPlan(u1, Seq(col("k")), "bytes", 25L)
      .select("k", "bin").as[(String, Long)].collect().toMap
    assert(got1 == Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 1L))

    // an oversized unit occupies its own bin; the next unit moves on
    val u2 = Seq(("a", 30L), ("b", 10L)).toDF("k", "bytes")
    val got2 = Layout.compactionPlan(u2, Seq(col("k")), "bytes", 25L)
      .select("k", "bin").as[(String, Long)].collect().toMap
    assert(got2 == Map("a" -> 0L, "b" -> 1L))
  }

  test("compactionPlan distributed prefix sum equals the window oracle") {
    // 500 units across shuffled input order; the partition-offset scheme
    // must reproduce the single-window cumulative form exactly
    val units = scala.util.Random.shuffle((1 to 500).toList)
      .map(i => (f"u$i%04d", (i % 37) * 100L + 1L)).toDF("k", "bytes")
    val got = Layout.compactionPlan(units, Seq(col("k")), "bytes", 5000L)
      .select("k", "bin").as[(String, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = units
      .withColumn("bin", expr("coalesce(sum(bytes) over (order by k rows between unbounded preceding and 1 preceding), 0L) div 5000L"))
      .select("k", "bin").as[(String, Long)].collect().toMap
    assert(got == want)
    // and the plan carries no whole-inventory single-partition window
    // (pre-adaptive physical plan: AQE wraps executedPlan in a leaf)
    val flags = graft.tools.PlanAudit.flagsOf(
      Layout.compactionPlan(units, Seq(col("k")), "bytes", 5000L)
        .queryExecution.sparkPlan)
    assert(flags.isEmpty, flags.mkString(", "))
  }

  test("zValue2 interleaves bits and matches its SQL mirror shape") {
    // x=0b101 (5), y=0b011 (3): z = x@even | y@odd = 1?0?1 with y bits
    // 1,1,0 at odd slots -> 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)
  }

  test("zValueN at N=2 equals zValue2; N=3 interleaves round-robin") {
    val df = Seq((5L, 3L, 6L)).toDF("x", "y", "w")
    val (z2, zn2) = df.select(
        Layout.zValue2(col("x"), col("y"), 5).as("a"),
        Layout.zValueN(Seq(col("x"), col("y")), 5).as("b"))
      .as[(Long, Long)].head()
    assert(z2 == zn2)
    // x=101, y=011, w=110: bit b of dim j at position 3b+j →
    // b0: x1 y1 w0 → 011 ; b1: x0 y1 w1 → 110 ; b2: x1 y0 w1 → 101
    // z = 101_110_011 (groups b2,b1,b0) = 0b101110011 = 371
    val z3 = df.select(
        Layout.zValueN(Seq(col("x"), col("y"), col("w")), 3).as("z"))
      .as[Long].head()
    assert(z3 == 371L)
  }

  test("zValueN SQL mirror renders the same bit terms") {
    val sql = Layout.zValueNSql(Seq("x", "y", "w"), 2)
    assert(sql.contains("((x >> 0) & 1) << 0"))
    assert(sql.contains("((w >> 1) & 1) << 5"))
  }

  test("zValueN curve has 3-D locality: octant dominates offset") {
    // any point in the low octant (all dims < 4) sorts before any point
    // in the high octant (all dims >= 4) at bits=3
    val lo = for { x <- 0L to 3L; y <- 0L to 3L; w <- 0L to 3L } yield (x, y, w)
    val hi = for { x <- 4L to 7L; y <- 4L to 7L; w <- 4L to 7L } yield (x, y, w)
    val zs = (lo ++ hi).toDF("x", "y", "w")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("w")), 3).as("z"),
        (col("x") < 4 && col("y") < 4 && col("w") < 4).as("low"))
      .as[(Long, Boolean)].collect()
    val maxLow = zs.filter(_._2).map(_._1).max
    val minHigh = zs.filterNot(_._2).map(_._1).min
    assert(maxLow < minHigh)
  }

  test("rleGain: hand-counted runs, distinct floors, and milli ratios") {
    // physical order by idx: a = x,x,y,y,x (3 runs / 2 distinct),
    //                        b = 1,2,3,4,5 (5 runs / 5 distinct)
    val df = Seq((1L, "x", 1L), (2L, "x", 2L), (3L, "y", 3L),
      (4L, "y", 4L), (5L, "x", 5L)).toDF("idx", "a", "b")
    val out = Layout.rleGain(df, Seq(col("idx")), Seq("a", "b"))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      ("a", 5L, 3L, 2L, 1666L, Some(1500L)),
      ("b", 5L, 5L, 5L, 1000L, Some(1000L))))
  }

  test("hilbert2: bijective over the grid and every curve step is one grid step") {
    val bits = 3
    val n = 1 << bits // 8x8
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val d2xy = Layout.withHilbert2(grid, col("x"), col("y"), bits, "d")
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, d) => d -> ((x, y)) }.toMap
    assert(d2xy.size == n * n) // bijective
    assert(d2xy.keys.min == 0L && d2xy.keys.max == (n * n - 1L))
    val unitSteps = (1 until n * n).forall { d =>
      val (x1, y1) = d2xy(d - 1L); val (x2, y2) = d2xy(d.toLong)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(unitSteps) // the defining Hilbert property
    // Morton (z-order) jumps at quadrant boundaries — quantify the edge
    val mortonAdj = grid
      .select(col("x"), col("y"), Layout.zValue2(col("x"), col("y"), bits).as("d"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, d) => d -> ((x, y)) }.toMap
    val mortonUnit = (1 until n * n).count { d =>
      val (x1, y1) = mortonAdj(d - 1L); val (x2, y2) = mortonAdj(d.toLong)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(mortonUnit < n * n - 1, s"morton unexpectedly all-adjacent")
  }

  test("rleGain audits its own sort key (order/audit name overlap is legal)") {
    // sorted by a itself: a = x,x,y -> 2 runs; b follows a's order via
    // the idx tiebreak: values (1,2,3) in that order -> 3 runs
    val df = Seq((1L, "y", 3L), (2L, "x", 1L), (3L, "x", 2L)).toDF("idx", "a", "b")
    val out = Layout.rleGain(df, Seq(col("a"), col("idx")), Seq("a", "b"))
      .select("column_name", "n_runs").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 2L), ("b", 3L)))
  }

  test("rleGain: null runs count, all-null columns report a null sorted gain") {
    // a = x,NULL,NULL,x -> 3 runs, 1 distinct (count distinct skips nulls);
    // c all-null -> 1 run, 0 distinct -> null gain (not an ANSI raise)
    val df = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, Some("x")))
      .toDF("idx", "a").withColumn("c", lit(null).cast("string"))
    val out = Layout.rleGain(df, Seq(col("idx")), Seq("a", "c"))
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      ("a", 4L, 3L, 1L, 1333L, Some(3000L)),
      ("c", 4L, 1L, 0L, 4000L, None)))
  }
}
