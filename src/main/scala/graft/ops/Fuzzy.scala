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

  /** `(id, s, variant)` — the exploded blocking table for `df`. */
  def deletionVariants(df: DataFrame, strCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"),
        explode(deletionNeighborhood(col("s"))).as("v"))

  /**
   * All unordered pairs of rows whose `strCol` values are within edit
   * distance 1 (including distance 0 — distinct rows carrying the same
   * string). Output: `(id_a, id_b, s_a, s_b, dist)` with `id_a < id_b`.
   *
   * The candidate set is deduplicated BEFORE the levenshtein check — a
   * pair can meet in several buckets (e.g. equal strings share every
   * deletion), and the exact check is the expensive per-row step.
   */
  def pairsWithin1(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    val va = deletionVariants(df, strCol, idCol).alias("fa")
    val vb = deletionVariants(df, strCol, idCol).alias("fb")
    val cand = va.join(vb,
        col("fa.v") === col("fb.v") && col("fa.id") < col("fb.id"))
      .select(col("fa.id").as("id_a"), col("fb.id").as("id_b"),
        col("fa.s").as("s_a"), col("fb.s").as("s_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= 1)
  }
}
