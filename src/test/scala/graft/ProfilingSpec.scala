package graft

import org.apache.spark.sql.functions._
import graft.ops.Profiling

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew ranks the heaviest keys with exact shares") {
    val df = (Seq.fill(6)("hub") ++ Seq.fill(3)("mid") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val top = Profiling.keySkew(df, Seq("k"), topN = 2)
      .select("k", "n", "share").as[(String, Long, Double)].collect().toSeq
    assert(top == Seq(("hub", 6L, 0.5), ("mid", 3L, 0.25)))
  }

  test("keySkew tie-break and cut are deterministic on any layout") {
    val df = Seq("b", "a", "c", "a", "b", "c").toDF("k").repartition(7)
    val top = Profiling.keySkew(df, Seq("k"), topN = 2)
      .select("k").as[String].collect().toSeq
    assert(top == Seq("a", "b")) // all tied at 2 → key order decides
  }
}
