package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bloom, Dedup, Sketches, TextAnalysis}

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  // ---- HyperLogLog -------------------------------------------------------

  test("hllEstimate is duplicate-insensitive and within HLL error bounds") {
    val n = 5000
    val values = (1 to n).map(i => ("a", s"value_$i"))
    // every value appears twice — max(rho) must be unaffected
    val df = (values ++ values).toDF("g", "v")
    val once = Sketches.hllEstimate(values.toDF("g", "v"), "g", col("v")).collect().head
    val twice = Sketches.hllEstimate(df, "g", col("v")).collect().head
    assert(once == twice, "duplicates must not move any register")
    val est = once.getAs[Double]("raw_estimate")
    // m=64 → standard error 1.04/8 = 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("hllCorrected linear-counts tiny cardinalities accurately") {
    val df = (1 to 20).map(i => ("g", s"v$i")).toDF("g", "v")
    val est = Sketches.hllCorrected(df, "g", col("v"))
      .collect().head.getAs[Double]("estimate")
    // small-range correction: low-variance but still hash-driven — 20
    // values land in 14–20 of 64 buckets depending on collisions
    assert(math.abs(est - 20) <= 8, s"corrected estimate $est for true 20")
    val raw = Sketches.hllEstimate(df, "g", col("v"))
      .collect().head.getAs[Double]("raw_estimate")
    assert(math.abs(est - 20) < math.abs(raw - 20),
      "correction must improve on the raw estimate in the small range")
  }

  test("hllEstimate strata are independent") {
    val df = ((1 to 100).map(i => ("a", s"x$i")) ++ (1 to 3).map(i => ("b", s"x$i")))
      .toDF("g", "v")
    val byG = Sketches.hllEstimate(df, "g", col("v")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_zero_registers")).toMap
    assert(byG("b") >= 61, "3 values can set at most 3 of b's 64 registers")
    assert(byG("a") < byG("b"))
  }

  // ---- Bloom -------------------------------------------------------------

  test("bloom mightContain has no false negatives") {
    val keys = (1L to 500L).map(i => i * 7919)
    val words = Bloom.build(keys.toDF("k"), "k", mBits = 4096)
    val misses = keys.toDF("k").where(!Bloom.mightContain(col("k"), words)).count()
    assert(misses == 0, "a bloom filter must pass every inserted key")
  }

  test("bloom semiJoin equals the plain semi-join") {
    val probe = (1L to 2000L).toDF("k")
    val build = (1L to 2000L by 13).toDF("k")
    val got = Bloom.semiJoin(probe, build, "k").as[Long].collect().toSet
    val want = probe.join(build, Seq("k"), "left_semi").as[Long].collect().toSet
    assert(got == want)
  }

  test("bloom sizeBits clamps to a power of two in range") {
    assert(Bloom.sizeBits(1) == 1024)
    assert(Bloom.sizeBits(1000) == 16384)
    assert(Bloom.sizeBits(Long.MaxValue) == (1 << 24))
    assert(Integer.bitCount(Bloom.sizeBits(12345)) == 1)
  }

  // ---- Gopher filters ----------------------------------------------------

  test("gopherFilters keeps prose and rejects degenerate docs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over and over with all of that other prose text here"),
      (2L, ""),                                     // empty
      (3L, "- one\n- two\n- three\n- four"),        // all bullets, no stopwords
      (4L, "to be # # # # # # # # # # # # # # the") // symbol spam
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilters(df, "text", "doc_id")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "plain prose must pass")
    assert(!out(2L), "empty doc must fail (word count)")
    assert(!out(3L), "bullet list must fail (bullet fraction / stopwords)")
    assert(!out(4L), "symbol spam must fail (symbol ratio)")
  }

  test("gopherFilters zero-word doc reports zeroed ratios, not NaN") {
    val r = TextAnalysis.gopherFilters(Seq((1L, "   ")).toDF("doc_id", "text"),
      "text", "doc_id").collect().head
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  // ---- canonicalByQuality ------------------------------------------------

  test("canonicalByQuality elects max score, tie → lowest id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc1", "doc2")
    val scored = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.5), // cluster 1: rep = 2
      (10L, 0.7), (11L, 0.7)           // cluster 10: tie → rep = 10
    ).toDF("doc_id", "quality_score")
    val out = Dedup.canonicalByQuality(pairs, scored, "doc_id")
      .select("component", "rep_id", "rep_score", "cluster_size")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 0.9, 3L), (10L, 10L, 0.7, 2L)))
  }
}
