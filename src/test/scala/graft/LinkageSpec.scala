package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private def pairs() = {
    val a = Seq((1L, "ann", "X", 100L), (2L, "bob", "X", 200L), (3L, "cat", "Y", 300L))
      .toDF("id", "nm", "blk", "v")
    val b = Seq((1L, "ann", "X", 100L), (2L, "rob", "X", 205L),
        (3L, "cat", "Y", 900L), (4L, "dan", "X", 100L))
      .toDF("id", "nm", "blk", "v")
    Linkage.blockPairs(a, b, Seq("blk"))
  }

  test("blockPairs: equi-blocked cross product with a_/b_ prefixes, block key shared") {
    val p = pairs()
    assert(p.columns.sorted.toSeq ==
      Seq("a_id", "a_nm", "a_v", "b_id", "b_nm", "b_v", "blk"))
    // block X: 2 a-rows x 3 b-rows; block Y: 1 x 1
    assert(p.count() == 7)
    assert(p.where(col("blk") === "Y").count() == 1)
    intercept[IllegalArgumentException](Linkage.blockPairs(pairs(), pairs(), Nil))
  }

  test("score: per-field milli contributions sum; missing gates to zero") {
    val rules = Seq(
      Linkage.FieldRule("nm", col("a_nm") === col("b_nm"), None, 2000L, -500L),
      Linkage.FieldRule("v", abs(col("a_v") - col("b_v")) <= 10L,
        Some(col("b_v").isNull), 1000L, -300L))
    val s = Linkage.score(pairs(), rules)
      .select(col("a_id"), col("b_id"), col("w_nm_milli"), col("w_v_milli"),
        col("score_milli"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(s((1L, 1L)) == ((2000L, 1000L, 3000L)))   // both agree
    assert(s((2L, 2L)) == ((-500L, 1000L, 500L)))    // name typo, value within band
    assert(s((3L, 3L)) == ((2000L, -300L, 1700L)))   // value drifted
    assert(s((1L, 4L)) == ((-500L, 1000L, 500L)))    // cross pair: equal values
    intercept[IllegalArgumentException](Linkage.score(pairs(), Nil))
  }

  test("score: a NULL comparison field lands in the disagreement branch, not NULL score") {
    val rules = Seq(Linkage.FieldRule("v", col("a_v") === col("b_v"),
      Some(col("b_v").isNull), 1000L, -300L))
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("a_id", "b_v")
      .withColumn("a_v", lit(5L))
    val s = Linkage.score(p, rules)
      .select(col("a_id"), col("score_milli")).as[(Long, Long)].collect().toMap
    assert(s(1L) == 1000L && s(2L) == 0L)
  }

  test("band: descending thresholds, floor label below every band") {
    val df = Seq(5200L, 3000L, 2999L, 1000L, -100L).toDF("s")
      .withColumn("band", Linkage.band(col("s"),
        Seq("match" -> 3000L, "possible" -> 1000L), "nonmatch"))
    val got = df.select("s", "band").as[(Long, String)].collect().toMap
    assert(got(5200L) == "match" && got(3000L) == "match")
    assert(got(2999L) == "possible" && got(1000L) == "possible")
    assert(got(-100L) == "nonmatch")
    intercept[IllegalArgumentException](
      Linkage.band(col("s"), Seq("a" -> 1000L, "b" -> 2000L), "c"))
    intercept[IllegalArgumentException](Linkage.band(col("s"), Nil, "c"))
  }
}
