package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.IncrementalAgg

class IncrementalAggStreamSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: DataFrame): Set[Seq[Any]] =
    rowsOf(df.select(col("k"), col("n_rows"), col("n_vals"),
      col("sum_val").cast("string"), col("min_val"), col("max_val")))

  test("updateState applies batches once; replayed batch ids are no-ops") {
    val dir = Files.createTempDirectory("graft_incstate").toString
    val b0 = Seq(("a", Some(1.0)), ("b", Some(2.0))).toDF("k", "v")
    val b1 = Seq(("a", Some(3.0)), ("c", None: Option[Double])).toDF("k", "v")

    assert(IncrementalAgg.updateState(b0, Seq("k"), "v", dir, batchId = 0L))
    assert(IncrementalAgg.updateState(b1, Seq("k"), "v", dir, batchId = 1L))
    // at-least-once replay of batch 1 must not double-count
    assert(!IncrementalAgg.updateState(b1, Seq("k"), "v", dir, batchId = 1L))

    val (got, lastId) = IncrementalAgg.readState(spark, dir).get
    assert(lastId == 1L)
    assert(canon(got) ==
      canon(IncrementalAgg.state(b0.unionByName(b1), Seq("k"), "v")))
  }

  test("crash between the swap's renames is recoverable: previous state + replay") {
    val dir = Files.createTempDirectory("graft_incstate_crash").toString
    val b0 = Seq(("a", Some(1.0)), ("b", Some(2.0))).toDF("k", "v")
    val b1 = Seq(("a", Some(3.0)), ("c", Some(5.0))).toDF("k", "v")
    assert(IncrementalAgg.updateState(b0, Seq("k"), "v", dir, batchId = 0L))

    // simulate the crash window inside batch 1's swap: current was
    // renamed to previous, _tmp never made it to current
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(root, "current"),
      new org.apache.hadoop.fs.Path(root, "previous")))

    // recovery: readState falls back to previous — history is NOT lost
    val (rec, recId) = IncrementalAgg.readState(spark, dir).get
    assert(recId == 0L)
    assert(canon(rec) == canon(IncrementalAgg.state(b0, Seq("k"), "v")))

    // the interrupted batch never committed, so the stream replays it;
    // the replayed merge lands on the recovered state and the final
    // artifact equals the no-crash run
    assert(IncrementalAgg.updateState(b1, Seq("k"), "v", dir, batchId = 1L))
    val (got, lastId) = IncrementalAgg.readState(spark, dir).get
    assert(lastId == 1L)
    assert(canon(got) ==
      canon(IncrementalAgg.state(b0.unionByName(b1), Seq("k"), "v")))
    // and the swap completed: no previous/_tmp left behind
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "previous")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_tmp")))
  }

  test("maintain over a file-replayed stream converges to the batch recompute") {
    val src = Files.createTempDirectory("graft_incsrc").toString
    val stateDir = Files.createTempDirectory("graft_incstate2").toString
    val part1 = Seq(("a", Some(1.5)), ("b", Some(2.0))).toDF("k", "v")
    val part2 = Seq(("a", Some(4.0)), ("c", Some(-1.0))).toDF("k", "v")
    part1.coalesce(1).write.parquet(s"$src/p1")
    part2.coalesce(1).write.parquet(s"$src/p2")

    val stream = spark.readStream.schema(part1.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$src/p*")
    val q = IncrementalAgg.maintain(stream, Seq("k"), "v", stateDir)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("graft_incck").toString)
      .start()
    q.awaitTermination(120000L)

    val (got, lastId) = IncrementalAgg.readState(spark, stateDir).get
    assert(lastId >= 1L, "expected at least two micro-batches")
    assert(canon(got) ==
      canon(IncrementalAgg.state(part1.unionByName(part2), Seq("k"), "v")))
  }
}
