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
}
