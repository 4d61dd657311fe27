package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

class PartitionPruneSpec extends SparkSuite {
  import spark.implicits._

  test("day-partitioned layout prunes to the selected partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("prune_spec").toString
    (0 until 200).map(i => (i.toLong, i % 10, s"v$i"))
      .toDF("id", "day", "payload")
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val filtered = spark.read.parquet(dir).where(col("day").between(3, 5))
    // drive THIS queryExecution (count() would plan a separate
    // aggregate query and leave this scan's metrics untouched)
    val rows = filtered.collect()
    assert(rows.length == 60)
    assert(rows.map(_.getAs[Int]("day")).toSet == Set(3, 4, 5))

    // plan-level guarantee: the scan's partition count is the SELECTED
    // days (3), not the 10 written; the day predicate rides
    // PartitionFilters, never a post-scan Filter over all files
    val scans = filtered.queryExecution.executedPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"day filter must be a partition filter: ${scan.partitionFilters}")
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("day")),
      s"scan metadata: ${scan.metadata.get("PartitionFilters")}")
    assert(scan.metrics("numPartitions").value == 3,
      s"pruned partition count: ${scan.metrics("numPartitions").value}")
  }

  test("unfiltered read scans every partition (the counter-case)") {
    val dir = java.nio.file.Files.createTempDirectory("prune_spec_all").toString
    (0 until 50).map(i => (i.toLong, i % 5)).toDF("id", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val all = spark.read.parquet(dir)
    val scan = all.queryExecution.executedPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }.head
    all.collect()
    assert(scan.metrics("numPartitions").value == 5)
  }
}
