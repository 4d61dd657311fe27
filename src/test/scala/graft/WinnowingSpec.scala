package graft

import graft.ops.Winnowing

class WinnowingSpec extends SparkSuite {
  import spark.implicits._

  private val K = 5
  private val W = 4

  test("shared substring of w+k-1 tokens guarantees a shared fingerprint") {
    // the winnowing guarantee (Schleimer et al. §3): any common run of
    // >= w+k-1 = 8 tokens spans at least one full window of identical
    // k-gram hashes in both docs, whose min must be selected in both
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $common x y z"),
      (2L, s"$common red blue green purple orange")
    ).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "text", "doc_id", K, W)
      .select("doc", "fp_hash").as[(Long, Long)].collect().toSet
    val shared = fp.collect { case (1L, h) => h } intersect
      fp.collect { case (2L, h) => h }
    assert(shared.nonEmpty)
  }

  test("uniform text selects each window's rightmost position") {
    // all gram hashes equal -> every full window's rightmost-min is its
    // END position: fingerprints at pos w..n, one hash, n-w+1 positions
    val n = 12 // grams for 16 identical tokens
    val docs = Seq((1L, Seq.fill(16)("tok").mkString(" "))).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "text", "doc_id", K, W)
      .select("fp_pos", "fp_hash").as[(Long, Long)].collect()
    assert(fp.map(_._1).sorted.toSeq == (W.toLong to n.toLong))
    assert(fp.map(_._2).distinct.length == 1)
  }

  test("short documents: one all-gram window; sub-k documents are absent") {
    val docs = Seq(
      (1L, "a b c d e f"), // 2 grams < w: single final-row window
      (2L, "a b c")        // < k tokens: no grams at all
    ).toDF("doc_id", "text")
    val prof = Winnowing.profile(docs, "text", "doc_id", K, W)
      .select("doc_id", "n_grams", "n_fp").as[(Long, Long, Long)].collect()
    assert(prof.toSeq == Seq((1L, 2L, 1L)))
  }

  test("fingerprint density sits in the ~2/(w+1) theorem band") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val stats = Winnowing.profile(docs, "text", "doc_id", K, W)
      .agg(org.apache.spark.sql.functions.expr("sum(n_fp) * 1000 div sum(n_grams)"))
      .as[Long].head()
    // expected 2000/(w+1) = 400 milli; allow a wide band for real text
    assert(stats >= 250 && stats <= 650, s"density $stats outside [250,650]")
  }

  test("contaminationStats: verbatim copies hit fully, long shared runs always hit") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // verbatim
      // w+k-1 = 8-token shared run inside fresh context: guarantee fires
      (2L, "pre1 pre2 alpha beta gamma delta epsilon zeta eta theta post1 post2"),
      (3L, "one two three four five six seven eight nine ten")          // disjoint
    ).toDF("doc_id", "text")
    val out = Winnowing.contaminationStats(corpus, bench, "text", "doc_id", K, W)
      .select("doc_id", "n_fp", "n_hit_fp", "hit_milli")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == out(1L)._2 && out(1L)._4 == 1000L) // every fp hits
    assert(out(2L)._3 >= 1L)                                // guarantee
    assert(out(3L)._3 == 0L && out(3L)._4 == 0L)
  }

  test("overlapPairs finds twins and the df cap suppresses hub hashes") {
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.overlapPairs(twins, "text", "doc_id", K, W,
      minShared = 1, maxDf = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // four identical docs, maxDf = 2: every hash is in 4 docs -> dropped
    val quads = Seq.tabulate(4)(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val capped = Winnowing.overlapPairs(quads, "text", "doc_id", K, W,
      minShared = 1, maxDf = 2).count()
    assert(capped == 0L)
  }
}
