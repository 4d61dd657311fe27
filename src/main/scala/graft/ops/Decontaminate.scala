package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag (and drop) training documents that share
 * long word n-grams with an evaluation/benchmark corpus — the standard
 * n-gram-overlap contamination check run before every training-data
 * release.
 *
 * Scale shape (corpus ~100 TB, benchmark ~MBs): the benchmark side is
 * reduced to a DISTINCT set of 60-bit gram hashes and BROADCAST; the
 * corpus-side gram stream is filtered by the broadcast hash join *before*
 * the per-document aggregation, so the only shuffle carries (doc, hit)
 * rows — contamination hits, normally a vanishing fraction of the corpus.
 * The corpus is scanned twice (gram extraction, then the removal
 * anti-join); the benchmark twice (tiny). Grams are compared
 * by [[Sampling.keyHash]] (md5-60) rather than by string: constant-width
 * join keys at scale, and the same hash is reproducible in any engine, so
 * the whole path stays value-checkable. A hash collision could at worst
 * flag one extra doc — acceptable for a removal filter (never corrupts
 * kept data), deterministic either way.
 *
 * The reference has no decontamination surface (its engine is
 * reconciliation joins, reference: src/reconciliatior.py) — LLM-pipeline
 * extension.
 */
object Decontaminate {

  /** Distinct 60-bit hashes of the benchmark's word n-grams (one small
    * frame, broadcast by the callers below). */
  def benchmarkGramHashes(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(Dedup.wordShingles(col(textCol), n)).as("__g"))
      .select(Sampling.keyHash(col("__g")).as("gram_hash"))
      .distinct()

  /**
   * Per-document contamination counts against `bench`: documents with at
   * least one n-gram found in the benchmark, with the number of DISTINCT
   * matching grams. Output: (idCol, n_hit_grams).
   */
  def overlapCounts(docs: DataFrame, bench: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val grams = Dedup.shingleTable(docs, textCol, idCol, n)
      .select(col("doc").as(idCol), Sampling.keyHash(col("shingle")).as("gram_hash"))
    grams
      .join(broadcast(benchmarkGramHashes(bench, textCol, n)), "gram_hash")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams")) // grams are pre-distinct per doc
  }

  /**
   * Per-document contamination profile over the WHOLE corpus (not just
   * hit docs): total distinct grams, benchmark-hit grams, and the hit
   * fraction — the report a release review reads before choosing the
   * removal threshold. Docs shorter than `n` tokens have no grams and are
   * absent (nothing to measure). Shape: the (tiny) benchmark hash set is
   * broadcast onto the gram stream as a LEFT join carrying a hit flag, so
   * both counts come out of the one per-doc aggregation — same single
   * corpus-side shuffle as [[overlapCounts]].
   */
  def contaminationStats(docs: DataFrame, bench: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val grams = Dedup.shingleTable(docs, textCol, idCol, n)
      .select(col("doc").as(idCol), Sampling.keyHash(col("shingle")).as("gram_hash"))
    val hitSet = benchmarkGramHashes(bench, textCol, n).withColumn("__hit", lit(1L))
    grams
      .join(broadcast(hitSet), Seq("gram_hash"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit_grams"))
      .withColumn("hit_frac",
        col("n_hit_grams").cast("double") / col("n_grams").cast("double"))
  }

  /**
   * Remove contaminated documents: keep docs whose distinct-gram overlap
   * with the benchmark is below `maxHits` (default: any overlap removes).
   * Left-anti against the hit list — NOT force-broadcast: when
   * contamination is normal (rare hits) AQE picks a broadcast join at
   * runtime anyway, and when it is widespread (adversarial corpus, or a
   * mis-set `n` that matches everything) the hit list can be corpus-sized
   * and a forced broadcast would blow the driver — the shuffle anti-join
   * is the safe degradation.
   */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String, idCol: String,
      n: Int, maxHits: Long = 1L): DataFrame = {
    val hits = overlapCounts(docs, bench, textCol, idCol, n)
      .where(col("n_hit_grams") >= maxHits)
    docs.join(hits.select(idCol), Seq(idCol), "left_anti")
  }
}
