package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Resample

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("regularize: gaps surface as zero-count filled rows; LOCF carries the last sum") {
    // user A: events in minutes 0 and 3 (buckets 0 and 3 at 1-min grid);
    // buckets 1-2 are silent. user B: a single bucket, no gaps.
    val df = Seq(
      ("A", ts(0), 1.5), ("A", ts(0), 2.5), ("A", ts(3), 10.0),
      ("B", ts(2), 7.0)
    ).toDF("u", "t", "v")
    val out = Resample.regularize(df, "u", "t", "v", intervalMs = 60000L)
      .select($"u", $"bucket", $"n_events", $"sum_val".cast("string"),
        $"filled", $"locf_sum".cast("string"))
      .as[(String, Long, Long, Option[String], Long, Option[String])]
      .collect().toSet
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 60000L
    assert(out == Set(
      ("A", base, 2L, Some("4.000000000"), 0L, Some("4.000000000")),
      ("A", base + 1, 0L, None, 1L, Some("4.000000000")),
      ("A", base + 2, 0L, None, 1L, Some("4.000000000")),
      ("A", base + 3, 1L, Some("10.000000000"), 0L, Some("10.000000000")),
      ("B", base + 2, 1L, Some("7.000000000"), 0L, Some("7.000000000"))))
  }

  test("resample alone: null values count as events but not into the sum") {
    val df = Seq(("A", ts(0), Some(3.0)), ("A", ts(0), None)).toDF("u", "t", "v")
    val r = Resample.resample(df, "u", "t", "v", 60000L)
      .select($"n_events", $"sum_val".cast("string"))
      .as[(Long, String)].head()
    assert(r == ((2L, "3.000000000")))
  }

  test("timeWeightedMean: LOCF durations weight the mean; last value holds to horizon") {
    // A: 100c for 10s then 500c for 10s (to horizon) -> twap 300c = 300000 mc.
    // B: single event AT the horizon -> span 0, null twap.
    val df = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 1.00, 1L),
      ("A", Timestamp.valueOf("2024-01-01 00:00:10"), 5.00, 2L),
      ("B", Timestamp.valueOf("2024-01-01 00:00:20"), 2.00, 3L)
    ).toDF("u", "t", "v", "id")
    val out = Resample.timeWeightedMean(df, "u", "t",
        floor($"v" * 100).cast("long"), "id")
      .as[(String, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      ("A", 2L, 20000000L, Some(300000L)),
      ("B", 1L, 0L, None)))
  }

  test("timeWeightedMean: simultaneous events — the earlier tie gets zero weight") {
    val df = Seq(
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 9.00, 1L), // 0-duration
      ("A", Timestamp.valueOf("2024-01-01 00:00:00"), 1.00, 2L),
      ("A", Timestamp.valueOf("2024-01-01 00:00:05"), 1.00, 3L)
    ).toDF("u", "t", "v", "id")
    val out = Resample.timeWeightedMean(df, "u", "t",
        floor($"v" * 100).cast("long"), "id")
      .as[(String, Long, Long, Option[Long])].head()
    assert(out == (("A", 3L, 5000000L, Some(100000L))))
  }

  test("timeWeightedMean rejects negative values loudly") {
    val df = Seq(("A", ts(0), -1.0, 1L), ("A", ts(1), 1.0, 2L))
      .toDF("u", "t", "v", "id")
    val e = intercept[Exception] {
      Resample.timeWeightedMean(df, "u", "t",
        floor($"v" * 100).cast("long"), "id").collect()
    }
    assert(e.getMessage.contains("negative value") ||
      Option(e.getCause).exists(_.getMessage.contains("negative value")))
  }

  test("gapFill of an entity with an all-null leading bucket keeps locf null until data") {
    val df = Seq(
      ("A", ts(0), None: Option[Double]), ("A", ts(2), Some(5.0))
    ).toDF("u", "t", "v")
    val out = Resample.regularize(df, "u", "t", "v", 60000L)
      .orderBy("bucket").select($"locf_sum".cast("string"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(None, None, Some("5.000000000")))
  }
}
