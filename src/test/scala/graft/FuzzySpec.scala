package graft

import graft.ops.Fuzzy
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSuite {
  import spark.implicits._

  test("deletionNeighborhood: the string plus each single deletion, dedup'd") {
    val out = Seq("abc", "aa", "", "x").toDF("s")
      .select(col("s"), Fuzzy.deletionNeighborhood(col("s")).as("nb"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("abc").toSet == Set("abc", "bc", "ac", "ab"))
    // both deletions of "aa" collapse to "a" — set semantics, no dup
    assert(out("aa").toSet == Set("aa", "a"))
    assert(out("") == Seq(""), "empty string has no fabricated variants")
    assert(out("x").toSet == Set("x", ""))
  }

  test("pairsWithin1 finds exactly the distance<=1 pairs, no cartesian leaks") {
    val rows = Seq(
      (1L, "kitten"),  // kitten/sitten: substitution, dist 1
      (2L, "sitten"),
      (3L, "kitte"),   // deletion of 1, dist 1 (and dist 2 from sitten)
      (4L, "kitten"),  // exact dup of 1, dist 0
      (5L, "banana")   // unrelated
    ).toDF("id", "name")
    val got = Fuzzy.pairsWithin1(rows, "name", "id")
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 0L),
      (2L, 4L, 1L), (3L, 4L, 1L)),
      s"unexpected pair set: $got")
  }

  test("pairsWithin1: transposition is distance 2 and excluded despite shared bucket") {
    // "ab"/"ba" share deletion variants "a" and "b" — candidates, but the
    // exact check must reject them (levenshtein, not Damerau)
    val rows = Seq((1L, "ab"), (2L, "ba")).toDF("id", "name")
    assert(Fuzzy.pairsWithin1(rows, "name", "id").count() == 0)
  }
}
