package graft.demo

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

/** The driver regenerates /root/testdata between rounds and has already
  * flipped events.ts between TIMESTAMP(NANOS) and timestamp[us] once
  * (round 8 broke all 14 events/stream registry queries). This spec writes
  * fixture per encoding the loader claims to support and proves each
  * round-trips to the same UTC instants, so the next regeneration cannot
  * break the loader silently. */
class EventsLoaderSpec extends SparkSuite {

  // one known instant: 2024-03-01T12:00:00Z = 1709294400000 ms
  private val ms = 1709294400000L

  private def tmp(): String = {
    val d = Files.createTempDirectory("events_fixture").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def loadedMs(dir: String): Seq[Long] = {
    val df = OpsQueries.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "loader must always emit TimestampType ts")
    df.select(unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  test("long-nanos ts fixture (legacy nanosAsLong path)") {
    val dir = tmp()
    // plain INT64 column reads as LongType — same shape nanosAsLong gives
    // a TIMESTAMP(NANOS) column, which Spark itself cannot write
    spark.range(3).select(
      (col("id") + 1).as("event_id"),
      (lit(ms) * 1000000L + col("id") * 1000000000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMs(dir) === Seq(ms, ms + 1000L, ms + 2000L))
  }

  test("timestamp_ntz micros ts fixture (round-8+ driver encoding)") {
    val dir = tmp()
    import spark.implicits._
    val base = LocalDateTime.of(2024, 3, 1, 12, 0, 0)
    Seq((1L, base), (2L, base.plusSeconds(1)), (3L, base.plusSeconds(2)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // sanity: this fixture really is NTZ on disk
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === TimestampNTZType)
    assert(loadedMs(dir) === Seq(ms, ms + 1000L, ms + 2000L))
  }

  test("instant (timestamp) ts fixture") {
    val dir = tmp()
    import spark.implicits._
    Seq((1L, new Timestamp(ms)), (2L, new Timestamp(ms + 1000)), (3L, new Timestamp(ms + 2000)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMs(dir) === Seq(ms, ms + 1000L, ms + 2000L))
  }

  test("current driver testdata loads and resolves") {
    val df = OpsQueries.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }

  test("driver testdata schema contract holds (documents, embeddings, events)") {
    // round 8 proved the driver regenerates testdata with changed
    // physical types between rounds (events.ts nanos → micros). The
    // events loader is adaptive now; for the OTHER load-bearing dtypes —
    // the float32 embedding arrays every vector kernel and every DuckDB
    // list_dot_product bit-identity argument depends on, and the id/text
    // columns — fail HERE, loudly and specifically, instead of via
    // dozens of mysterious registry breakages.
    def field(table: String, name: String) =
      spark.read.parquet(s"$sf/$table.parquet").schema(name).dataType
    assert(field("embeddings", "embedding") === ArrayType(FloatType, containsNull = true)
      || field("embeddings", "embedding") === ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding drifted to ${field("embeddings", "embedding")} — " +
        "the float32 kernel/oracle bit-identity contract no longer holds")
    assert(field("embeddings", "vec_id") === LongType)
    assert(field("documents", "doc_id") === LongType)
    assert(field("documents", "text") === StringType)
    assert(field("documents", "lang") === StringType)
    assert(field("documents", "source") === StringType)
    assert(field("events", "event_id") === LongType)
    assert(field("events", "user_id") === LongType)
    assert(field("events", "event_type") === StringType)
    assert(field("events", "value") === DoubleType)
  }
}
