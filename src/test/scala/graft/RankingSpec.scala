package graft

import org.apache.spark.sql.functions._
import graft.ops.Ranking

class RankingSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    ("en", 1L, 0.9), ("en", 2L, 0.8), ("en", 3L, 0.7), ("en", 4L, 0.6),
    ("de", 5L, 0.5), ("de", 6L, 0.4),
    ("fr", 7L, 0.3)
  ).toDF("lang", "doc_id", "score")

  test("topKPerGroup keeps k best per group with ranks, short groups intact") {
    val top = Ranking.topKPerGroup(df, Seq("lang"),
      Seq(col("score").desc, col("doc_id")), k = 2)
    val byLang = top.select("lang", "doc_id", "rank").as[(String, Long, Int)]
      .collect().groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(byLang("en") == Set((1L, 1), (2L, 2)))
    assert(byLang("de") == Set((5L, 1), (6L, 2)))
    assert(byLang("fr") == Set((7L, 1)))
  }

  test("topKPerGroup ties break deterministically on any layout") {
    val tied = Seq(("en", 3L, 1.0), ("en", 1L, 1.0), ("en", 2L, 1.0))
      .toDF("lang", "doc_id", "score")
    val pick = Ranking.topKPerGroup(tied.repartition(5), Seq("lang"),
      Seq(col("score").desc, col("doc_id")), k = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(pick == Seq(1L))
  }

  test("cdfMilli: tie-aware upper CDF, strata independent") {
    val df = Seq(("a", 10L), ("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 5L)).toDF("g", "v")
    val out = Ranking.cdfMilli(df, "g", "v")
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
    // ties 10,10: both rank 2 of 4 -> 500; 20 -> 750; 30 -> 1000
    assert(out(("a", 10L)) == Set(500L))
    assert(out(("a", 20L)) == Set(750L))
    assert(out(("a", 30L)) == Set(1000L))
    assert(out(("b", 5L)) == Set(1000L))
  }
}
