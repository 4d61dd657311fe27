package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.recon.Sources

class RunningSumSpec extends SparkSuite {
  import spark.implicits._

  test("withRunningSumRanged equals the global-window prefix sum") {
    val df = (1 to 500).map(i => (i.toLong, (i * 7 % 13).toLong))
      .toDF("k", "v").repartition(7)
    val ranged = Sources.withRunningSumRanged(df, "cum", col("v"), Seq(col("k")))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val window = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(ranged == window)
  }

  test("withRunningSumRanged: descending order and layout independence") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 5L), ("d", 1L), ("e", 9L))
      .toDF("k", "v")
    def run(parts: Int) =
      Sources.withRunningSumRanged(df.repartition(parts), "cum", col("v"),
          Seq(col("v").desc, col("k")))
        .select("k", "cum").as[(String, Long)].collect().toMap
    // e(9) -> a(5) -> c(5) -> b(3) -> d(1)
    val expect = Map("e" -> 9L, "a" -> 14L, "c" -> 19L, "b" -> 22L, "d" -> 23L)
    assert(run(1) == expect)
    assert(run(4) == expect)
  }

  test("withRunningSumRanged preserves the input columns plus the sum") {
    val df = Seq((1L, 2L, "x")).toDF("a", "b", "c")
    val out = Sources.withRunningSumRanged(df, "s", col("b") * 2, Seq(col("a")))
    assert(out.columns.toSeq == Seq("a", "b", "c", "s"))
    assert(out.select("s").as[Long].head() == 4L)
  }
}
