package graft

import graft.ops.History
import java.sql.Timestamp

class HistorySpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  private def log = Seq(
    // user 1: A A B A — three runs (the second A is a NEW run, not a
    // merge with the first: SCD-2 tracks time order, not distinct states)
    (1L, 1L, "A", ts(1)),
    (2L, 1L, "A", ts(2)),
    (3L, 1L, "B", ts(3)),
    (4L, 1L, "A", ts(4)),
    // user 2: single state, one open-ended interval
    (5L, 2L, "B", ts(1)),
    (6L, 2L, "B", ts(5))
  ).toDF("event_id", "user_id", "event_type", "ts")

  test("scd2 collapses consecutive runs into tiling half-open intervals") {
    val out = History.scd2(log, "user_id", "event_type", "ts", "event_id")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, "A", ts(1), Some(ts(3)), 2L, 1L),
      (1L, "B", ts(3), Some(ts(4)), 1L, 2L),
      (1L, "A", ts(4), None, 1L, 3L),
      (2L, "B", ts(1), None, 2L, 1L)))
  }

  test("stateAsOf reconstructs the dimension at a point in time") {
    import org.apache.spark.sql.functions.lit
    val dim = History.scd2(log, "user_id", "event_type", "ts", "event_id")
    // at 00:03:30 user 1 is in its B run, user 2 in its open B run
    val at = History.stateAsOf(dim, lit(Timestamp.valueOf("2026-01-01 00:03:30")))
      .select("user_id", "state").as[(Long, String)].collect().toSet
    assert(at == Set((1L, "B"), (2L, "B")))
    // before anyone's first event: nobody exists
    assert(History.stateAsOf(dim,
      lit(Timestamp.valueOf("2026-01-01 00:00:30"))).count() == 0L)
    // open-ended intervals cover arbitrarily late instants
    val late = History.stateAsOf(dim, lit(Timestamp.valueOf("2030-01-01 00:00:00")))
      .select("user_id", "state").as[(Long, String)].collect().toSet
    assert(late == Set((1L, "A"), (2L, "B")))
  }

  test("enrichAsOf attaches the state covering each fact's probe instant") {
    import org.apache.spark.sql.functions.{col, expr}
    val dim = History.scd2(log, "user_id", "event_type", "ts", "event_id")
    // probe 1ms before each event: run-opening events see the PREVIOUS
    // run's state; the entity's very first event sees null
    val probed = log.withColumn("probe", col("ts") - expr("INTERVAL 1 MILLISECOND"))
    val out = History.enrichAsOf(probed, dim, "user_id", "probe")
      .select("event_id", "asof_state").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).isEmpty)            // user 1's first event
    assert(out(2L) == Some("A"))       // mid-run
    assert(out(3L) == Some("A"))       // B-run opener: state before was A
    assert(out(4L) == Some("B"))
    assert(out(5L).isEmpty)            // user 2's first event
    assert(out(6L) == Some("B"))
  }

  test("scd2 breaks timestamp ties by the tie column") {
    val tied = Seq(
      (2L, 1L, "B", ts(1)), // same ts, higher id — ordered SECOND
      (1L, 1L, "A", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = History.scd2(tied, "user_id", "event_type", "ts", "event_id")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Long)]
      .collect().toSet
    assert(out == Set(
      (1L, "A", ts(1), Some(ts(1)), 1L, 1L),
      (1L, "B", ts(1), None, 1L, 2L)))
  }

  test("timeToEvent: first-from to first-subsequent-to, censoring, absence") {
    val ev = Seq(
      // user 1: view@1, purchase@3 (and an earlier purchase@0 that must
      // NOT count — conversion is at-or-after the start)
      (1L, 1L, "purchase", ts(0)), (2L, 1L, "view", ts(1)), (3L, 1L, "purchase", ts(3)),
      // user 2: view but never purchase -> censored
      (4L, 2L, "view", ts(2)),
      // user 3: purchase only, no view -> absent
      (5L, 3L, "purchase", ts(4))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = History.timeToEvent(ev, "user_id", "ts", "event_type", "view", "purchase")
      .select("user_id", "delta_ms", "censored")
      .as[(Long, Option[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((Some(120000L), 0L)), 2L -> ((None, 1L))))
  }

  test("rollingFeatures: bounded frames, integer cents, per-entity gaps") {
    val ev = Seq(
      (1L, 1L, 1.00, ts(1)),
      (2L, 1L, 2.00, ts(2)),
      (3L, 1L, 3.00, ts(3)),
      (4L, 1L, 4.00, ts(4)),
      (5L, 1L, 5.00, ts(5)),
      (6L, 2L, -0.015, ts(1)) // floor(-1.5) = -2: floor, not truncate
    ).toDF("event_id", "user_id", "value", "ts")
    val out = History.rollingFeatures(ev, "user_id", "value", "ts", "event_id", window = 4)
      .select("user_id", "event_id", "value_cents", "prev_cents", "roll_cents", "gap_ms", "seq")
      .as[(Long, Long, Long, Option[Long], Long, Option[Long], Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // seq 5 frame holds events 2..5 only: 200+300+400+500
    assert(out((1L, 5L)) == (1L, 5L, 500L, Some(400L), 1400L, Some(60000L), 5L))
    // first event of each entity: no prev, no gap, frame = itself
    assert(out((1L, 1L)) == (1L, 1L, 100L, None, 100L, None, 1L))
    assert(out((2L, 6L)) == (2L, 6L, -2L, None, -2L, None, 1L))
  }

  test("rollingTimeWindow: frames bound by TIME, not row count; ties are peers") {
    val ev = Seq(
      // user 1: a 3-event burst inside one minute, then one event an
      // hour later — the 10-minute window sees the burst together and
      // the late event alone
      (1L, 1.00, Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, 2.00, Timestamp.valueOf("2026-01-01 00:00:20")),
      (1L, 4.00, Timestamp.valueOf("2026-01-01 00:00:40")),
      (1L, 8.00, Timestamp.valueOf("2026-01-01 01:10:00")),
      // user 2: two events at the SAME instant — peers, both see both
      (2L, 1.00, Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, 2.00, Timestamp.valueOf("2026-01-01 00:00:00"))
    ).toDF("user_id", "value", "ts")
    val out = History.rollingTimeWindow(ev, "user_id", "value", "ts",
        windowMs = 600000L)
      .select("user_id", "value_cents", "n_window", "sum_window_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 1L, 100L),
      (1L, 200L, 2L, 300L),
      (1L, 400L, 3L, 700L),
      (1L, 800L, 1L, 800L), // an hour later: the burst aged out
      (2L, 100L, 2L, 300L), // tied timestamps are peers both ways
      (2L, 200L, 2L, 300L)))
  }

  test("rollingTimeWindow: window boundary is inclusive of exactly windowMs - 1 back") {
    val ev = Seq(
      (1L, 1.00, Timestamp.valueOf("2026-01-01 00:00:00")),
      (1L, 2.00, Timestamp.valueOf("2026-01-01 00:10:00")) // exactly 600000 ms later
    ).toDF("user_id", "value", "ts")
    val out = History.rollingTimeWindow(ev, "user_id", "value", "ts", 600000L)
      .where($"value_cents" === 200L)
      .select("n_window").as[Long].head()
    // (t − windowMs, t]: the event exactly windowMs earlier is OUTSIDE
    assert(out == 1L)
  }

  test("strict-past range frame + forward as-of = leakage-free feature/label rows") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the events_training_matrix construction on a hand-checked fixture
    val ev = Seq(
      // user 1: spend 100 at t=0, click anchor at t=10min,
      // purchase at t=10min+24h EXACTLY (inclusive label edge)
      (1L, 1L, "purchase", 0L, Some(1.00)),
      (2L, 1L, "click", 600000L, Some(0.0)),
      (3L, 1L, "purchase", 600000L + 86400000L, Some(5.0)),
      // user 2: anchor with an event at the SAME ms — strictly-before
      // frame must EXCLUDE the simultaneous row (no self/peer leakage)
      (4L, 2L, "view", 1000L, Some(9.0)),
      (5L, 2L, "click", 1000L, Some(0.0)),
      // and user 2's purchase is 24h+1ms later: label 0
      (6L, 2L, "purchase", 1000L + 86400001L, Some(1.0))
    ).toDF("event_id", "user_id", "event_type", "ms", "value")
      .withColumn("cents", floor(col("value") * 100).cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-604800000L, -1L)
    val anchors = ev
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("spend_7d_cents", coalesce(sum(col("cents")).over(w), lit(0L)))
      .where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ms"), col("n_7d"), col("spend_7d_cents"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms"), col("ms").as("next_ms"))
    val out = graft.ops.AsOfJoin.asOfForward(anchors, purchases, Seq("user_id"),
        "ms", "p_ms", Seq("next_ms"), tiebreak = col("next_ms"))
      .select(col("event_id"), col("n_7d"), col("spend_7d_cents"),
        when(col("asof_next_ms").isNotNull &&
          col("asof_next_ms") - col("ms") <= 86400000L, 1L).otherwise(0L).as("label"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // user 1: one prior event (the t=0 purchase, 100 cents); label 1 at
    // the exact 24h edge
    assert(out(2L) == ((2L, 1L, 100L, 1L)))
    // user 2: simultaneous view EXCLUDED from features; purchase 1 ms
    // past the window -> label 0
    assert(out(5L) == ((5L, 0L, 0L, 0L)))
  }

  test("debounceFirst: burst chains collapse to their first event, per key") {
    val ev = Seq(
      // user 1 clicks: burst of three 10 s apart, then 2 min quiet,
      // then a lone event — keep first of burst + the lone one
      (1L, 1L, "click", Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, 1L, "click", Timestamp.valueOf("2026-01-01 00:00:10")),
      (3L, 1L, "click", Timestamp.valueOf("2026-01-01 00:00:20")),
      (4L, 1L, "click", Timestamp.valueOf("2026-01-01 00:02:30")),
      // same user, different TYPE inside the burst window: its own key
      (5L, 1L, "view", Timestamp.valueOf("2026-01-01 00:00:05")),
      // chain semantics: each link <= gap even though first-to-last > gap
      (6L, 2L, "click", Timestamp.valueOf("2026-01-01 00:00:00")),
      (7L, 2L, "click", Timestamp.valueOf("2026-01-01 00:00:50")),
      (8L, 2L, "click", Timestamp.valueOf("2026-01-01 00:01:40"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val kept = History.debounceFirst(ev, Seq("user_id", "event_type"),
        "ts", "event_id", gapMs = 60000L)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  test("temporalSplit: floor cut per entity, ties by the tie column") {
    val ev = Seq(
      // user 1: 5 events -> first 4 train (4000 <= 4000), 5th eval
      (1L, 1L, "a", ts(1)), (2L, 1L, "a", ts(2)), (3L, 1L, "a", ts(3)),
      (4L, 1L, "a", ts(4)), (5L, 1L, "a", ts(5)),
      // user 2: 2 events -> earliest train, last eval
      (6L, 2L, "a", ts(1)), (7L, 2L, "a", ts(2)),
      // user 3: single event -> floor convention: eval
      (8L, 3L, "a", ts(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = History.temporalSplit(ev, "user_id", "ts", "event_id", trainMilli = 800)
      .select("event_id", "split").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "train", 2L -> "train", 3L -> "train", 4L -> "train",
      5L -> "eval", 6L -> "train", 7L -> "eval", 8L -> "eval"))
  }

  test("transitionCounts: adjacency counts and exact milli-probabilities") {
    val out = History.transitionCounts(log, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    // user 1: A→A, A→B, B→A; user 2: B→B
    assert(out == Set(
      ("A", "A", 1L, 500L),
      ("A", "B", 1L, 500L),
      ("B", "A", 1L, 500L),
      ("B", "B", 1L, 500L)))
  }

  test("logRank: identical cohorts score exactly 0; a shifted cohort scores 1.0") {
    // identical event times in both cohorts -> O1 = E1 -> z = 0
    val same = Seq((5L, 1L, 0L), (15L, 1L, 0L), (5L, 1L, 1L), (15L, 1L, 1L))
      .toDF("t", "e", "g")
    val z0 = graft.ops.History.logRank(same, "t", "e", "g", bucketMs = 10L)
      .select("o1", "e1_milli", "v_micro", "z")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(z0 == ((2L, 2000L, 333333L, Some(0.0d))))
    // cohort 0 converts a bucket earlier: z = 500/sqrt(250000) = 1.0
    val shifted = Seq((5L, 1L, 0L), (15L, 1L, 1L)).toDF("t", "e", "g")
    val z1 = graft.ops.History.logRank(shifted, "t", "e", "g", bucketMs = 10L)
      .select("o1", "o2", "e1_milli", "v_micro", "z")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(z1 == ((1L, 1L, 500L, 250000L, Some(1.0d))))
  }

  test("markovEval: learned argmax scored on the future; unseen states keep null") {
    import java.sql.Timestamp
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // train (before day 3): u1 walks a->b, a->b, a->c  => predict a->b
    // eval (day 3+): pairs a->b (hit), a->c (miss), z->a (z unseen in train)
    val df = Seq(
      (1L, t(1, 1), 1L, "a"), (2L, t(1, 2), 1L, "b"), (3L, t(1, 3), 1L, "a"),
      (4L, t(1, 4), 1L, "b"), (5L, t(1, 5), 1L, "a"), (6L, t(1, 6), 1L, "c"),
      (7L, t(3, 1), 2L, "a"), (8L, t(3, 2), 2L, "b"),
      (9L, t(3, 3), 2L, "a"), (10L, t(3, 4), 2L, "c"),
      (11L, t(3, 5), 3L, "z"), (12L, t(3, 6), 3L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val cut = Timestamp.valueOf("2024-01-03 00:00:00").getTime
    val out = graft.ops.History.markovEval(df, "user_id", "event_type",
        "ts", "event_id", cutMs = cut)
      .as[(String, Option[String], Long, Long, Long)].collect().toSet
    // eval pairs for u2: a->b, b->a, a->c; u3: z->a
    assert(out == Set(
      ("a", Some("b"), 2L, 1L, 500L),
      ("b", Some("a"), 1L, 1L, 1000L),
      ("z", None, 1L, 0L, 0L)))
  }

  test("survivalKm: hand-computed curve; censoring shrinks risk without counting") {
    // bucket=10ms. w0: event@5 (n=5, q=800, S=800). w1: event@15 +
    // censor@15 (n=4, q=750, S=600). w2: event@25 + censor@25
    // (n=2, q=500, S=300).
    val df = Seq((5L, 1L), (15L, 1L), (15L, 0L), (25L, 0L), (25L, 1L))
      .toDF("t", "e")
    val out = graft.ops.History.survivalKm(df, "t", "e", bucketMs = 10L)
      .select("w", "n_at_risk", "d", "c", "q_milli", "s_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 5L, 1L, 0L, 800L, 800L),
      (1L, 4L, 1L, 1L, 750L, 600L),
      (2L, 2L, 1L, 1L, 500L, 300L)))
  }

  test("survivalKm without censoring tracks the empirical fraction (floor bias ≤1‰/step)") {
    // 4 events in distinct buckets: exact S = 750/500/250/0; the
    // fixed-point product floors each step (q1 = 666 not 666.67), so
    // the curve reads 750/499/249/0 — the documented deterministic bias
    val df = Seq((1L, 1L), (11L, 1L), (21L, 1L), (31L, 1L)).toDF("t", "e")
    val s = graft.ops.History.survivalKm(df, "t", "e", bucketMs = 10L)
      .orderBy("w").select("s_milli").as[Long].collect().toSeq
    assert(s == Seq(750L, 499L, 249L, 0L))
    assert(s.zip(Seq(750L, 500L, 250L, 0L)).forall { case (g, e) => e - g <= 2 })
  }
}
