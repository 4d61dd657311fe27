package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  private val body = (1 to 40).map(i => s"w$i").mkString(" ")

  test("chunks tile each document exactly, in order") {
    val df = Seq((1L, body), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunkTable(df, "text", "doc_id", w = 4, divisor = 8)
      .select("doc", "chunk_start", "chunk_tokens")
      .as[(Long, Long, Long)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc(1L).map(_._3).sum == 40L, "chunk lengths must sum to the token count")
    // starts begin at 1 and each next start is prev start + prev length
    for ((d, cs) <- byDoc) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 1L, s"doc $d first chunk must start at 1")
      sorted.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) => assert(s2 == s1 + n1, s"gap in doc $d")
        case _ =>
      }
    }
    assert(byDoc(2L).map(_._3).sum == 3L, "short doc = one whole chunk")
    assert(!byDoc.contains(3L), "empty doc has no chunks")
  }

  test("boundaries re-align after an insertion (the CDC property)") {
    val df = Seq((1L, body), (2L, s"inserted words up front $body")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunkTable(df, "text", "doc_id", w = 4, divisor = 8)
      .select("doc", "chunk_hash").as[(Long, Long)].collect()
    val h1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val h2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = (h1 & h2).size
    assert(shared >= 1, "chunks after the first shared boundary must re-align and hash equal")
    // and the stats arm sees the duplication on both docs
    val stats = Dedup.cdcChunkStats(df, "text", "doc_id", w = 4, divisor = 8)
      .select("doc_id", "n_dup_chunks").as[(Long, Long)].collect().toMap
    assert(stats(1L) >= 1L && stats(2L) >= 1L)
  }

  test("exact copies duplicate every chunk; unrelated docs none") {
    val df = Seq((1L, body), (2L, body),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val stats = Dedup.cdcChunkStats(df, "text", "doc_id", w = 4, divisor = 8)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(stats(1L)._2 == stats(1L)._3 && stats(1L)._4 == 1000L, "copy: all chunks dup")
    assert(stats(2L)._2 == stats(2L)._3 && stats(2L)._4 == 1000L)
    assert(stats(3L)._3 == 0L && stats(3L)._4 == 0L, "unrelated: none")
  }
}
