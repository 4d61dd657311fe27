package graft

import org.apache.spark.sql.functions._

/**
 * Runtime bloom-filter join pruning — Catalyst's InjectRuntimeFilter rule.
 * At the 100 TB scale a shuffle join whose build side is selective should
 * not shuffle the full probe side: Spark builds a bloom filter over the
 * build-side join keys at runtime and pre-filters the probe side's scan.
 * This is configuration + plan shape, not custom code — the spec pins the
 * behavior so the engine keeps qualifying for it (deterministic
 * expressions on the join keys, equi-join form, file-backed probe side).
 */
class RuntimeFilterSpec extends SparkSuite {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective build side injects a bloom filter on the probe scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local test files are tiny — drop the size gates so the rule fires
      // the same way it would on a 100 TB probe side
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force a shuffle join
    ) {
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT") // selective build side
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter in:\n$plan")
      // and it must not change results vs the un-filtered plan
      val n = joined.count()
      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        assert(lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count() == n)
      }
    }
  }
}
