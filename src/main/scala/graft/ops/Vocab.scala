package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed vocabulary induction — the BPE merge-step (Sennrich et
 * al., "Neural machine translation of rare words with subword units",
 * ACL'16 — re-derived, not copied) as a Spark aggregation.
 *
 * The classic trick that makes BPE tractable on a 100 TB corpus: the
 * corpus collapses to its WORD-FREQUENCY table first (one hash
 * aggregation with map-side combine — vocabulary-sized, not
 * corpus-sized), and every pair-counting pass after that runs over
 * vocab rows weighted by frequency. A merge iteration therefore costs
 * O(vocab · word-length) no matter how many tokens the corpus has;
 * only the initial word count ever sees the data.
 *
 * The full BPE training loop (re-segment after each chosen merge) is a
 * DRIVER loop re-invoking [[pairCounts]] on the re-segmented vocab —
 * the same shape as the k-means trainer in `Similarity.kmeansTrain`:
 * each iteration is one bounded distributed pass over the vocab-sized
 * frame, the loop control is driver-side. This module ships the
 * corpus-heavy steps ([[wordCounts]], [[pairCounts]], [[topMerges]]);
 * re-segmentation is corpus-independent by construction.
 */
object Vocab {

  /** `(word, freq)` — the corpus-to-vocabulary collapse. The ONLY pass
    * over the data; everything downstream is vocab-sized. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /**
   * Zipf profile in EXACT arithmetic: token frequency mass per DOUBLING
   * rank band (band b holds ranks [2^b, 2^(b+1))). Under a Zipf law with
   * exponent ~1 every band carries roughly equal mass, so the band table
   * is a fitted-slope readout with no `ln`/`pow` anywhere (libm-specific
   * — see [[Sketches]]); the band index is a CASE ladder over integer
   * rank, exact in any engine. Ranks come from the distributed two-pass
   * row index over (freq desc, word) — no single-partition rank window,
   * so the profile scales to a 100M-type web vocabulary unchanged.
   *
   * Output: (band, lo_rank, n_types, mass, mass_milli), band capped at
   * `maxBand` (deeper ranks pool into the last band).
   */
  def zipfBands(df: DataFrame, textCol: String, maxBand: Int = 19): DataFrame = {
    require(maxBand >= 1 && maxBand <= 62, s"maxBand out of range: $maxBand")
    // cut once: the rank pass and the total pass would otherwise each
    // re-run the corpus-sized wordCounts aggregation
    val wc = graft.recon.Checkpoints.cut(wordCounts(df, textCol))
    val ranked = graft.recon.Sources.withRowIndexRanged(
      wc, "rank", Seq(col("freq").desc, col("word")))
    val band = (0 until maxBand).foldRight(lit(maxBand).cast("int")) {
      (b, rest) => when(col("rank") < (1L << (b + 1)), b).otherwise(rest)
    }
    val total = wc.agg(sum(col("freq")).as("__total"))
    ranked.withColumn("band", band)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_types"), sum(col("freq")).as("mass"))
      .crossJoin(broadcast(total))
      .select(col("band"), expr("shiftleft(1L, band)").as("lo_rank"),
        col("n_types"), col("mass"),
        expr("(1000 * mass) div __total").as("mass_milli"))
  }

  /**
   * BPE merge STABILITY audit: learn the top-k merges independently on
   * two deterministic corpus halves and align them — the "is my merge
   * list an artifact of this sample" check run before freezing a
   * tokenizer. Merges found by both halves carry both ranks and their
   * absolute rank delta; one-sided merges keep a null opposite rank
   * (the instability signal itself). Two vocab-sized merge learns plus
   * one ≤2k-row full-outer join.
   */
  def mergeStability(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    def half(m: Long) = topMerges(pairCounts(wordCounts(
      df.where(pmod(col(idCol), lit(2)) === m), textCol)), k)
    val ra = half(0L).select(col("a"), col("b"), col("rank").as("rank_a"))
    val rb = half(1L).select(col("a"), col("b"), col("rank").as("rank_b"))
    ra.join(rb, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"), col("rank_a"), col("rank_b"),
        when(col("rank_a").isNotNull && col("rank_b").isNotNull,
          abs(col("rank_a") - col("rank_b"))).as("rank_delta"))
  }

  /**
   * `(a, b, weight)` — corpus-weighted adjacent symbol-pair counts over
   * a `(word, freq)` vocab frame, symbols = single characters (BPE
   * iteration 1; later iterations feed a re-segmented vocab back through
   * the same aggregation). One row per pair OCCURRENCE before the
   * aggregate — a pair appearing twice in a word counts twice, exactly
   * the quantity BPE maximizes. Narrow explode over vocab rows, one
   * bounded shuffle on the (a, b) pair.
   */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val w = col("word")
    val pairs = when(length(w) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), length(w) - 1),
        i => struct(w.substr(i, lit(1)).as("a"), w.substr(i + 1, lit(1)).as("b"))))
    vocab.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("weight"))
  }

  /**
   * The APPLY side of BPE: the space-delimited symbol string of `word`
   * after applying `merges` in order, each merging every occurrence of
   * the adjacent pair. A merge is two `regexp_replace` passes over the
   * symbol string — one pass alone under-merges when consecutive
   * occurrences share a boundary space (the regex scan resumes AFTER
   * the consumed trailing space, so in `a b a b` it merges pair 1 and
   * skips pair 2); a skipped occurrence always sits between two merged
   * neighbors (skips are never consecutive), so pass two catches
   * exactly the survivors and the result equals the full merge.
   *
   * Requires `a != b`: with distinct symbols every pair occurrence is
   * token-disjoint, so "merge all occurrences" is well-defined and the
   * two-pass result is exact (spec-checked against a reference
   * implementation on adjacency-adversarial words). A self-merge
   * (`a a` over a run) must pick which overlapping pairs win — that
   * needs stateful left-to-right machinery, not a regex, and is
   * rejected loudly rather than silently mis-segmented. Merge symbols
   * are restricted to `[A-Za-z0-9]` so they are regex- and
   * engine-neutral literals. Pure per-row projection, codegen'd when
   * used at the top level (keep it OUT of higher-order-function lambdas
   * — they run interpreted).
   */
  def segment(word: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    merges.foreach { case (a, b) =>
      require((a + b).matches("[A-Za-z0-9]+"), s"merge symbols must be [A-Za-z0-9]+: ($a,$b)")
      require(a != b,
        s"self-merge ($a,$b) is ambiguous over runs; regex passes cannot express it")
    }
    val base = concat(lit(" "), array_join(split(word, ""), " "), lit(" "))
    val out = merges.foldLeft(base) { case (c, (a, b)) =>
      val once = regexp_replace(c, s" $a $b ", s" $a$b ")
      regexp_replace(once, s" $a $b ", s" $a$b ")
    }
    trim(out)
  }

  /**
   * Exact greedy BPE segmentation via the native codegen kernel
   * (`graft.functions.BpeSegment` → `TextOps.bpeApply`): the canonical
   * sequential leftmost-first semantics for ANY merge list, including
   * the self-merges [[segment]] rejects — the portable-vs-native
   * duality this repo uses everywhere (md5 vs xxhash64 fingerprints):
   * [[segment]] is oracle-mirrorable SQL, this is the full-semantics
   * fast path, spec-checked against a reference implementation and
   * against [[segment]] on their shared domain. Returns array<string>.
   */
  def segmentExact(word: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.bpe_segment(word, merges)

  /**
   * Per-document subtoken accounting under a FIXED merge list — the
   * "how many tokens will this corpus cost under my learned vocab"
   * estimator. Output: `(idCol, n_words, n_chars, n_subtokens)` (docs
   * with no words drop out, like every tokenizing aggregate here). One
   * narrow explode + one per-doc aggregation; the merge regexes run in
   * whole-stage codegen at the top level of the projection.
   */
  def subtokenStats(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .select(col(idCol), length(col("__w")).cast("long").as("__c"),
        size(split(segment(col("__w"), merges), " ")).cast("long").as("__n"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__c")).as("n_chars"),
        sum(col("__n")).as("n_subtokens"))

  /** Top-`k` merge candidates by corpus weight (ties → pair
    * lexicographic, the deterministic analogue of "first seen").
    * orderBy+limit plans as TakeOrderedAndProject — distributed heaps,
    * no global sort; the rank stamps the k survivors only. */
  def topMerges(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"bad k=$k")
    val top = pairs.orderBy(col("weight").desc, col("a"), col("b")).limit(k)
    // window over ≤ k rows — bounded by construction
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("weight").desc, col("a"), col("b"))))
      .select(col("a"), col("b"), col("weight"), col("rank"))
  }
}
