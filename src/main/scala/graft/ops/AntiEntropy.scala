package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Anti-entropy reconciliation digests — the scale path for "are these
 * two 100 TB replicas equal, and if not, WHERE?". A full row-level
 * compare (reference: src/reconciliatior.py joins every row of both
 * ledgers) reads both tables completely; replica drift after an
 * incident is typically confined to a few ingest ranges, so the
 * Dynamo/Cassandra-style repair plan is: hash-bucket both sides,
 * compare per-bucket DIGESTS (bucket-count-sized frames), and pay
 * row-level work only inside the buckets that disagree — then hand
 * exactly those rows to [[SnapshotDiff]] for the field-level verdict.
 *
 * Digest algebra: each row's canonical string (null-sentineled, so
 * (a, NULL) ≠ (a ++ NULL-less shift) — `concat_ws` alone would
 * conflate them) hashes to 60 bits; a bucket's digest is the SUM of
 * row hashes in DECIMAL(38,0) — commutative (partition-order-free),
 * map-side combinable, and exact: 10^18 rows × 2^60 ≈ 10^36 < 10^38,
 * no wraparound divergence between engines. Count rides alongside so
 * compensating hash collisions with different cardinalities still
 * surface.
 */
object AntiEntropy {

  /** Canonical row string: every column stringified with a NUL-ish
    * sentinel for NULL and a 0x01 separator — injective for fixed
    * schemas (no separator/sentinel ambiguity). */
  private def canonical(cols: Seq[String]): Column =
    concat(cols.flatMap(c =>
      Seq(coalesce(col(c).cast("string"), lit("\u0002")), lit("\u0001"))): _*)

  /** Per-bucket digest of `df`: `(bucket, n_rows, digest)` with
    * `bucket = keyHash(keys) % nBuckets`. `cols` is the full compared
    * column list (keys included — order matters, fix it). */
  def bucketDigests(df: DataFrame, keyCols: Seq[String], cols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(keyCols.nonEmpty, "no key columns")
    require(cols.nonEmpty, "no compared columns")
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    df.select(
        (Sampling.keyHash(canonical(keyCols)) % nBuckets).as("bucket"),
        Sampling.keyHash(canonical(cols)).cast(DecimalType(38, 0)).as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("digest"))
  }

  /** Buckets whose digests disagree between two [[bucketDigests]]
    * frames (same keys/cols/nBuckets — the caller's contract):
    * `(bucket, n_a, n_b, status)` with status 'missing_a'/'missing_b'/
    * 'mismatch'. Equal buckets are NOT emitted — at scale the output
    * is drift-sized, not bucket-count-sized. */
  def diffDigests(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("n_rows").as("n_a"), col("digest").as("__da"))
    val r = b.select(col("bucket"), col("n_rows").as("n_b"), col("digest").as("__db"))
    l.join(r, Seq("bucket"), "full_outer")
      .withColumn("status",
        when(col("__da").isNull, lit("missing_a"))
          .when(col("__db").isNull, lit("missing_b"))
          .when(col("__da") =!= col("__db") || col("n_a") =!= col("n_b"),
            lit("mismatch")))
      .where(col("status").isNotNull)
      .select(col("bucket"), col("n_a"), col("n_b"), col("status"))
  }

  /** The repair plan's row-level stage: rows of `df` falling in the
    * given disagreeing buckets (broadcast membership filter at the
    * scan — only drifted buckets are ever re-read). Feed both sides'
    * survivors to [[SnapshotDiff.diff]] for the field verdict. */
  def bucketRows(df: DataFrame, keyCols: Seq[String], nBuckets: Int,
      buckets: DataFrame): DataFrame =
    df.withColumn("bucket", Sampling.keyHash(canonical(keyCols)) % nBuckets)
      .join(broadcast(buckets.select("bucket").distinct()), Seq("bucket"), "left_semi")
}
