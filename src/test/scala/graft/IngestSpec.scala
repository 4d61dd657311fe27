package graft

import java.nio.file.Files
import graft.ops.{Ingest, IncrementalAgg}

class IngestSpec extends SparkSuite {
  import spark.implicits._

  test("newFiles sees only unledgered files; commit guards double-ingest") {
    val data = Files.createTempDirectory("graft_ingest").toString
    val ledger = s"$data/../${new java.io.File(data).getName}_ledger"
    Seq(("a", 1.0)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p1")
    Seq(("b", 2.0)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p2")

    val batch0 = Ingest.newFiles(spark, data, ledger)
    assert(batch0.size == 2, s"two part files expected, got $batch0")
    assert(Ingest.readBatch(spark, data, batch0).count() == 2L)
    Ingest.commit(spark, ledger, batch0, batchId = 0L)

    // nothing new -> empty batch, empty read with the right schema
    assert(Ingest.newFiles(spark, data, ledger).isEmpty)
    val empty = Ingest.readBatch(spark, data, Seq.empty)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("k", "v"))

    // a third file arrives: only it is new
    Seq(("c", 3.0)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p3")
    val batch1 = Ingest.newFiles(spark, data, ledger)
    assert(batch1.size == 1 && batch1.head.contains("p3"))
    assert(Ingest.readBatch(spark, data, batch1)
      .as[(String, Double)].collect().toSet == Set(("c", 3.0)))

    // re-committing the same path is refused
    Ingest.commit(spark, ledger, batch1, batchId = 1L)
    val e = intercept[IllegalArgumentException] {
      Ingest.commit(spark, ledger, batch1, batchId = 2L)
    }
    assert(e.getMessage.contains("re-commit"))
  }

  test("ledger diff is an anti-join: multi-part-file ledger never funnels whole") {
    val data = Files.createTempDirectory("graft_ingest4").toString
    val ledger = s"$data/../${new java.io.File(data).getName}_ledger"
    // three commits -> three parquet part files -> the ledger read spans
    // multiple partitions; the diff must still be exact
    for (i <- 1 to 3) {
      Seq((s"v$i", i.toDouble)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p$i")
      val b = Ingest.newFiles(spark, data, ledger)
      assert(b.size == 1 && b.head.contains(s"p$i"))
      Ingest.commit(spark, ledger, b, batchId = i.toLong)
    }
    assert(spark.read.parquet(ledger).inputFiles.length >= 3,
      "ledger should span multiple part files for this test")
    // two files arrive at once: the anti-join returns exactly those, sorted
    Seq(("x", 9.0)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p9")
    Seq(("y", 8.0)).toDF("k", "v").coalesce(1).write.parquet(s"$data/p8")
    val fresh = Ingest.newFiles(spark, data, ledger)
    assert(fresh.size == 2 && fresh == fresh.sorted)
    assert(fresh.exists(_.contains("p8")) && fresh.exists(_.contains("p9")))
    // semi-join dup guard still fires against the multi-part ledger
    Ingest.commit(spark, ledger, fresh, batchId = 4L)
    val e = intercept[IllegalArgumentException] {
      Ingest.commit(spark, ledger, fresh.take(1), batchId = 5L)
    }
    assert(e.getMessage.contains("re-commit"))
  }

  test("ledger-driven ingest composes with shard-wise HLL sketch maintenance") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Sketches
    val data = Files.createTempDirectory("graft_ingest3").toString
    val ledger = s"$data/../${new java.io.File(data).getName}_ledger"
    (1 to 300).map(i => ("g", s"v${i % 120}")).toDF("g", "v")
      .coalesce(1).write.parquet(s"$data/p1")
    val b0 = Ingest.newFiles(spark, data, ledger)
    // batch-0 registers become the persisted sketch
    var regs = Sketches.hllRegisters(Ingest.readBatch(spark, data, b0), "g", col("v"))
      .collect().toSeq
    Ingest.commit(spark, ledger, b0, 0L)

    (200 to 500).map(i => ("g", s"v$i")).toDF("g", "v")
      .coalesce(1).write.parquet(s"$data/p2")
    val b1 = Ingest.newFiles(spark, data, ledger)
    // merge ONLY the new batch's registers — history is never re-read
    val merged = Sketches.hllMerge(Seq(
      spark.createDataFrame(spark.sparkContext.parallelize(regs),
        Sketches.hllRegisters(Ingest.readBatch(spark, data, b1), "g", col("v")).schema),
      Sketches.hllRegisters(Ingest.readBatch(spark, data, b1), "g", col("v"))), "g")
    Ingest.commit(spark, ledger, b1, 1L)

    val whole = Sketches.hllRegisters(
      spark.read.option("recursiveFileLookup", "true").parquet(data), "g", col("v"))
    assert(rowsOf(merged) == rowsOf(whole),
      "incremental register maintenance must equal the whole-corpus sketch")
  }

  test("ledger-driven ingest composes with the incremental rollup state") {
    val data = Files.createTempDirectory("graft_ingest2").toString
    val ledger = s"$data/../${new java.io.File(data).getName}_ledger"
    val state = s"$data/../${new java.io.File(data).getName}_state"
    Seq(("a", Some(1.0)), ("b", Some(2.0))).toDF("k", "v")
      .coalesce(1).write.parquet(s"$data/p1")
    val b0 = Ingest.newFiles(spark, data, ledger)
    IncrementalAgg.updateState(Ingest.readBatch(spark, data, b0),
      Seq("k"), "v", state, batchId = 0L)
    Ingest.commit(spark, ledger, b0, 0L)

    Seq(("a", Some(4.0))).toDF("k", "v").coalesce(1).write.parquet(s"$data/p2")
    val b1 = Ingest.newFiles(spark, data, ledger)
    IncrementalAgg.updateState(Ingest.readBatch(spark, data, b1),
      Seq("k"), "v", state, batchId = 1L)
    Ingest.commit(spark, ledger, b1, 1L)

    val (got, _) = IncrementalAgg.readState(spark, state).get
    val full = IncrementalAgg.state(
      Seq(("a", Some(1.0)), ("b", Some(2.0)), ("a", Some(4.0))).toDF("k", "v"),
      Seq("k"), "v")
    assert(rowsOf(got.select("k", "n_rows", "sum_val")) ==
      rowsOf(full.select("k", "n_rows", "sum_val")))
  }
}
