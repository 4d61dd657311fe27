package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) matching via DELETION-NEIGHBORHOOD blocking —
 * the scale path for "which entity identifiers are one typo apart", a
 * reconciliation staple (mis-keyed account ids, OCR'd invoice numbers)
 * and a curation one (typo-cluster detection for normalization
 * dictionaries).
 *
 * The naive form is a cartesian self-join filtered on
 * `levenshtein(a, b) <= 1` — O(n²) comparisons, a non-starter past a few
 * thousand rows. The blocking identity this operator exploits instead:
 * two strings within edit distance 1 ALWAYS share a member of each
 * other's deletion neighborhood (the string itself plus every
 * single-character deletion) —
 *   - equal strings share the string itself;
 *   - a substitution at position i makes both i-deletions equal;
 *   - an insertion/deletion makes one string equal to a deletion of the
 *     other.
 * So an equi-join on the exploded neighborhood finds EVERY candidate
 * pair (no false negatives), and one exact `levenshtein` check per
 * candidate removes the false positives (e.g. "ab"/"ba" share deletion
 * "a" at distance 2). Cost: O(n·len) variant rows into a hash join
 * instead of O(n²) comparisons — and the join keys shuffle-partition
 * like any other equi-join, so the pattern holds on a cluster.
 *
 * Bucket sizes are bounded by structure, not data volume: a variant `v`
 * of length L can only be produced by `v` itself or by one of its
 * single-character INSERTIONS, of which at most (L+1)·|alphabet| exist —
 * so no variant bucket can go quadratic the way a hot join key can.
 * (FastSS, Bocek et al. 2007, is the published form of this scheme.)
 */
object Fuzzy {

  /** The deletion neighborhood of `s` as an array column: `s` itself
    * plus each string obtained by deleting exactly one character.
    * Pure column expression (stays in whole-stage codegen). Null or
    * empty input yields just `[s]` — `sequence(1, 0)` would otherwise
    * count DOWN in Spark and fabricate variants. */
  def deletionNeighborhood(s: Column): Column =
    when(s.isNull || length(s) === 0, array(s)).otherwise(
      array_union(
        array(s),
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** `(id, s, variant)` — the exploded blocking table for `df`. The
    * repartition spreads a single-split input across all cores BEFORE
    * the explode: the variant generation, join probe, and levenshtein
    * verify all live in this pipeline, and a small dimension table
    * otherwise runs the whole thing on one core (measured 10 s → 1.6 s
    * at sf0.1, where 15k names fan out to ~1M verified candidates). */
  def deletionVariants(df: DataFrame, strCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(strCol).as("s"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("id"), col("s"),
        explode(deletionNeighborhood(col("s"))).as("v"))

  /**
   * All unordered pairs of rows whose `strCol` values are within edit
   * distance 1 (including distance 0 — distinct rows carrying the same
   * string). Output: `(id_a, id_b, s_a, s_b, dist)` with `id_a < id_b`.
   *
   * The exact levenshtein check runs BEFORE the pair dedup: the check is
   * a codegen'd per-row op on strings the bucket join already holds,
   * while the dedup is the plan's only exchange — verifying first means
   * only TRUE pairs (times their small bucket multiplicity — a pair can
   * meet in a few buckets) reach the shuffle, instead of every
   * false-positive candidate the blocking admits. Re-computing
   * levenshtein on a duplicate candidate costs far less than shuffling
   * it. (With [[deletionVariants]]' parallelism barrier this pair of
   * fixes took the sf0.1 benchmark from 6.7 s to 1.5 s; the barrier is
   * the larger share.)
   */
  def pairsWithin1(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    val va = deletionVariants(df, strCol, idCol).alias("fa")
    val vb = deletionVariants(df, strCol, idCol).alias("fb")
    va.join(vb,
        col("fa.v") === col("fb.v") && col("fa.id") < col("fb.id"))
      .select(col("fa.id").as("id_a"), col("fb.id").as("id_b"),
        col("fa.s").as("s_a"), col("fb.s").as("s_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= 1)
      .distinct()
  }
}
