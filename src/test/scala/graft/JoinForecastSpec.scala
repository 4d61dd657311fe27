package graft

import graft.ops.JoinForecast
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

class JoinForecastSpec extends SparkSuite {
  import spark.implicits._

  private def a = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("k", "va")
  private def b = Seq((1L, 10), (1L, 11), (1L, 12), (3L, 13), (4L, 14)).toDF("k", "vb")

  test("joinSizeEstimate equals the actual join's output count") {
    val df = JoinForecast.joinSizeEstimate(a, b, Seq("k"))
    // the forecast column is DECIMAL(38,0): a hub key's f_A·f_B (or the
    // total) past 2^63 must stay exact, never wrap — the guard that reads
    // this number exists precisely for that tier
    assert(df.schema("n_output_rows").dataType == DecimalType(38, 0))
    val est = df.select(col("n_left"), col("n_right"), col("n_overlap_keys"),
        col("n_output_rows").cast("long"))
      .as[(Long, Long, Long, Long)].head()
    val actual = a.join(b, Seq("k")).count()
    // key 1: 2*3=6 pairs; key 3: 1*1=1 → 7 output rows, 2 overlap keys
    assert(est == ((4L, 5L, 2L, 7L)))
    assert(est._4 == actual)
  }

  test("disjoint keys forecast zero output, not a null") {
    val c = Seq((9L, "q")).toDF("k", "vc")
    val est = JoinForecast.joinSizeEstimate(a, c, Seq("k"))
      .select(col("n_left"), col("n_right"), col("n_overlap_keys"),
        col("n_output_rows").cast("long"))
      .as[(Long, Long, Long, Long)].head()
    assert(est == ((4L, 1L, 0L, 0L)))
  }

  test("skewTopK ranks keys by pair contribution with exact milli shares") {
    val df = JoinForecast.skewTopK(a, b, Seq("k"), k = 2)
    assert(df.schema("n_pairs").dataType == DecimalType(38, 0))
    val top = df
      .select(col("k"), col("n_pairs").cast("long"), col("share_milli"), col("rank"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(top == Seq((1L, 6L, 857L, 1L), (3L, 1L, 142L, 2L)))
  }

  test("skewTopK tie-break is by key order, stable under repartition") {
    val l = Seq((5L, "a"), (6L, "b"), (7L, "c")).toDF("k", "v")
    val r = Seq((5L, 1), (6L, 2), (7L, 3)).toDF("k", "w")
    val top = JoinForecast.skewTopK(l.repartition(3), r.repartition(2), Seq("k"), k = 2)
      .select("k", "rank").as[(Long, Long)].collect().toSet
    assert(top == Set((5L, 1L), (6L, 2L)))
  }
}
