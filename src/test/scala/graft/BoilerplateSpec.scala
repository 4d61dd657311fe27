package graft

import graft.ops.TextAnalysis

class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  // source s1: "the" in 3/3 docs, "buy" in 2/3; s2: "the" in 1/2 only
  private def docs = Seq(
    (1L, "s1", "the quick buy fox"),
    (2L, "s1", "the lazy dog"),
    (3L, "s1", "buy the thing buy"),
    (4L, "s2", "the other host"),
    (5L, "s2", "different words here")
  ).toDF("doc_id", "source", "text")

  test("boilerplateTokens is per-source document frequency, not term frequency") {
    val bp = TextAnalysis.boilerplateTokens(docs, "source", "text", "doc_id", 600)
      .as[(String, String, Long)].collect().toSet
    // s1: the=1000, buy=666 (df counts DOCS: the doubled "buy" counts once)
    assert(bp == Set(("s1", "the", 1000L), ("s1", "buy", 666L)))
  }

  test("stripBoilerplate removes only the source's own boilerplate") {
    val out = TextAnalysis.stripBoilerplate(docs, "source", "text", "doc_id", 600)
      .select("doc_id", "n_tokens_before", "n_tokens_after", "stripped_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, "quick fox")))
    assert(out(3L) == ((3L, 4L, 1L, "thing")))
    // s2 keeps "the": 1/2 docs is below the 60% bar there
    assert(out(4L) == ((4L, 3L, 3L, "the other host")))
    assert(out(5L) == ((5L, 3L, 3L, "different words here")))
  }

  test("characteristicTerms ranks by exact lift; minCount floors noise") {
    // corpus: 10 tokens total; group g1 has 5: "cat" 3/5 in-group vs
    // 3/10 corpus -> lift 2000; "dog" 2/5 vs 7/10 -> lift 714
    val d = Seq(
      (1L, "g1", "cat cat cat dog dog"),
      (2L, "g2", "dog dog dog dog dog")
    ).toDF("doc_id", "grp", "text")
    val out = TextAnalysis.characteristicTerms(d, "grp", "text", k = 2, minCount = 2L)
      .select("grp", "token", "n", "lift_milli", "rank")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("g1", "cat", 3L, 2000L, 1L),
      ("g1", "dog", 2L, 571L, 2L),
      ("g2", "dog", 5L, 1428L, 1L)))
  }

  test("a source with no boilerplate and blank docs pass through") {
    val d = Seq((1L, "s", "a b"), (2L, "s", "c d"), (3L, "s", " "))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.stripBoilerplate(d, "source", "text", "doc_id", 900)
      .select("doc_id", "n_tokens_after", "stripped_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, "a b")))
    assert(out(3L) == ((3L, 0L, "")))
  }
}
