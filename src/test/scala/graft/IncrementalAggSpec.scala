package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    ("a", Some(1.5)), ("a", Some(2.25)), ("a", None),
    ("b", Some(-3.0)), ("c", None)
  ).toDF("k", "v")
  private def delta = Seq(
    ("a", Some(10.0)), ("b", Some(0.5)), ("d", Some(7.0))
  ).toDF("k", "v")

  private def canon(df: DataFrame): Set[Seq[Any]] =
    rowsOf(df.select("k", "n_rows", "n_vals", "sum_val", "min_val", "max_val"))

  test("merge of split states equals the state of the full batch, exactly") {
    val full = IncrementalAgg.state(base.unionByName(delta), Seq("k"), "v")
    val merged = IncrementalAgg.merge(Seq("k"),
      Seq(IncrementalAgg.state(base, Seq("k"), "v"),
        IncrementalAgg.state(delta, Seq("k"), "v")))
    assert(canon(merged) == canon(full))
    // schema must also be identical — a widened decimal would break
    // the next merge round
    assert(merged.schema == full.schema)
  }

  test("groups on one side only pass through; all-null groups keep null sum/min/max") {
    val merged = IncrementalAgg.merge(Seq("k"),
      Seq(IncrementalAgg.state(base, Seq("k"), "v"),
        IncrementalAgg.state(delta, Seq("k"), "v")))
    val c = merged.where($"k" === "c")
      .select($"n_rows", $"n_vals", $"sum_val".isNull, $"min_val".isNull)
      .as[(Long, Long, Boolean, Boolean)].head()
    assert(c == ((1L, 0L, true, true)))
    val d = merged.where($"k" === "d").select($"n_rows", $"max_val")
      .as[(Long, Double)].head()
    assert(d == ((1L, 7.0)))
  }

  test("merge is order- and grouping-insensitive (monoid)") {
    val s1 = IncrementalAgg.state(base, Seq("k"), "v")
    val s2 = IncrementalAgg.state(delta, Seq("k"), "v")
    val s3 = IncrementalAgg.state(Seq(("a", Some(0.125))).toDF("k", "v"), Seq("k"), "v")
    val left = IncrementalAgg.merge(Seq("k"),
      Seq(IncrementalAgg.merge(Seq("k"), Seq(s1, s2)), s3))
    val right = IncrementalAgg.merge(Seq("k"), Seq(s3, s2, s1))
    assert(canon(left) == canon(right))
  }

  test("malformed state fails loudly") {
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(Seq("k"), Seq(base))
    }
    assert(e.getMessage.contains("missing columns"))
  }
}
