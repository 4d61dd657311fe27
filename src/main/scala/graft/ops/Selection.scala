package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection for pretraining: score every raw document by how much
 * its hashed n-gram profile looks like a TARGET corpus (a trusted
 * high-quality set) relative to the raw pool, then keep the top-scoring
 * docs — the DSIR recipe (Xie et al., "Data selection for language
 * models via importance resampling", NeurIPS'23 — re-derived, not
 * copied), with one deliberate change: the textbook importance weight is
 * `Σ log p_target(f)/p_raw(f)`, but `log`'s last ulp is libm-specific,
 * so the score here is the cross-multiplied linear surrogate
 *
 *   `Σ_f [ (t_f + 1)·(R + B) − (r_f + 1)·(T + B) ]`
 *
 * (t/r = target/raw bucket counts with add-one smoothing, T/R their
 * totals, B the bucket count) — exactly the sign-preserving numerator of
 * `Σ [ p̂_target(f) − p̂_raw(f) ]`, kept in DECIMAL(38,0) so engine and
 * oracle agree bit for bit at any corpus size (BIGINT would overflow:
 * counts reach ~1e13 bigrams at the 100 TB tier and each product is
 * count×total ≈ 1e26).
 *
 * Scale shape: the feature space is hashed into `nBuckets` buckets, so
 * both distribution tables are bounded frames built by one aggregation
 * each and BROADCAST to the per-doc feature stream; the only data-sized
 * shuffle is the per-doc score aggregation, and the final selection is
 * orderBy+limit (TakeOrderedAndProject — distributed heaps, no global
 * sort). Nothing anywhere scales with vocabulary size.
 */
object Selection {

  /** `(idCol, bucket)` hashed-bigram occurrence stream of a corpus —
    * one row per bigram occurrence (multiplicities preserved; docs with
    * fewer than 2 tokens contribute nothing). The token array is
    * MATERIALIZED behind a repartition barrier before the shingle
    * lambda touches it — higher-order-function lambdas run interpreted
    * and are not CSE'd, so an inlined tokenizer would re-split the text
    * on every `element_at` access (~2× per bigram; measured 5× slower
    * end-to-end). Same discipline as `TextAnalysis.repetitionMetrics`. */
  def hashedBigrams(df: DataFrame, textCol: String, idCol: String,
      nBuckets: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .repartition(par)
      .select(col(idCol), explode(Dedup.shinglesOfTokens(col("__toks"), 2)).as("__g"))
      .select(col(idCol), pmod(Sampling.keyHash(col("__g")), lit(nBuckets.toLong)).as("bucket"))
  }

  /** `(bucket, cnt)` feature distribution of a corpus — ≤ nBuckets rows,
    * one hash aggregation with map-side combine. Same materialize-
    * before-lambda barrier as [[hashedBigrams]]. */
  def bucketCounts(df: DataFrame, textCol: String, nBuckets: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .repartition(par)
      .select(explode(Dedup.shinglesOfTokens(col("__toks"), 2)).as("__g"))
      .select(pmod(Sampling.keyHash(col("__g")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Top-`k` raw documents by target-affinity score (ties → lowest id).
   * Output: `(idCol, n_feats, score, rank)` — ranking happens on the
   * exact DECIMAL(38,0) surrogate; the emitted `score` is its one
   * final cast to double (correctly rounded in any engine — large
   * decimals don't round-trip pandas/parquet uniformly, exactly like
   * the money sums in `Sinks.summary`). `n_feats` is the doc's bigram
   * count. Docs with no bigram features score nothing and are never
   * selected.
   */
  def selectByAffinity(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, nBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && nBuckets >= 2, s"bad k=$k / nBuckets=$nBuckets")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val b = lit(nBuckets.toLong)

    val tCounts = bucketCounts(target, textCol, nBuckets)
      .withColumnRenamed("cnt", "__tc")
    val rCounts = bucketCounts(raw, textCol, nBuckets)
      .withColumnRenamed("cnt", "__rc")
    val tTotal = tCounts.agg(sum(col("__tc")).as("__tt"))
    val rTotal = rCounts.agg(sum(col("__rc")).as("__rt"))

    // an empty target (no docs, or none with ≥ 2 tokens) would make the
    // target total NULL and every affinity score NULL — the top-k would
    // then "select" arbitrary null-scored docs. Fail loudly, but IN-PLAN
    // (raise_error where the null total would poison the score) — an
    // earlier eager `head(1)` probe here ran a Spark job at every plan
    // construction, a BUILD-time cost each caller paid before any action.
    // Semantics note: being in-plan, the guard fires only when at least one
    // scored row is evaluated — empty raw + empty target returns an EMPTY
    // frame rather than raising (the eager probe raised). That is the
    // intended contract: "select from nothing" is vacuously satisfiable and
    // the error exists to stop NULL scores from ranking real documents, a
    // hazard that cannot arise without rows to rank.
    val ttGuarded = when(col("__tt").isNotNull, col("__tt"))
      .otherwise(raise_error(
        lit("selectByAffinity: target corpus has no bigram features")).cast("long"))

    val scored = hashedBigrams(raw, textCol, idCol, nBuckets)
      .join(broadcast(tCounts), Seq("bucket"), "left")
      .join(broadcast(rCounts), Seq("bucket"), "left") // always hits: raw ⊇ the doc
      .crossJoin(broadcast(tTotal))
      .crossJoin(broadcast(rTotal))
      .select(col(idCol),
        (dec(coalesce(col("__tc"), lit(0L)) + lit(1L)) * dec(col("__rt") + b) -
          dec(coalesce(col("__rc"), lit(0L)) + lit(1L)) * dec(ttGuarded + b))
          .as("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__term")).cast("decimal(38,0)").as("score"))

    val top = scored.orderBy(col("score").desc, col(idCol)).limit(k)
    // window over ≤ k rows — bounded by construction
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .select(col(idCol), col("n_feats"),
        col("score").cast("double").as("score"), col("rank"))
  }
}
