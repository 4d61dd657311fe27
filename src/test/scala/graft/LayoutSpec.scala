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

  test("zValue2 interleaves bits and matches its SQL mirror shape") {
    // x=0b101 (5), y=0b011 (3): z = x@even | y@odd = 1?0?1 with y bits
    // 1,1,0 at odd slots -> 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)
  }
}
