package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval-overlap joins as EQUI-joins — the bucket ("bin") trick that
 * replaces the O(|A|·|B|) theta join a naive `a.start < b.end AND
 * b.start < a.end` condition plans as (Spark executes non-equi joins as
 * BroadcastNestedLoopJoin, which at 100 TB is a non-starter when neither
 * side broadcasts). Both sides explode each interval into the fixed-grain
 * buckets it covers; sharing a bucket is then a hash-shuffle equi-key,
 * and the real overlap predicate filters inside the join. The explosion
 * factor is interval length / bucket size, so pick `bucketMs` near the
 * typical interval length: shorter buckets inflate the explode, longer
 * buckets inflate the per-bucket candidate sets.
 */
object Intervals {

  /**
   * Inner join of half-open intervals: rows of `a` × `b` where
   * `[aStart, aEnd)` overlaps `[bStart, bEnd)`, i.e. `aStart < bEnd AND
   * bStart < aEnd` (touching intervals do NOT match). All four columns
   * are epoch-ms longs; empty or inverted intervals (end ≤ start) drop
   * out. A pair whose intervals share several buckets would match the
   * equi-key several times, so the join keeps only the FIRST shared
   * bucket — the one containing `greatest(aStart, bStart)`, which an
   * overlapping pair always covers on both sides — and no post-join
   * distinct (a full extra shuffle) is ever needed. Column sets must be
   * disjoint; rename before calling.
   */
  def overlapJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive: $bucketMs")
    val dup = a.columns.toSet.intersect(b.columns.toSet)
    require(dup.isEmpty, s"overlapJoin: column names collide: $dup")
    // the bound column names are interpolated into expression strings —
    // reject names that would parse as something else (the rowChecks rule)
    Seq(aStart, aEnd, bStart, bEnd).foreach(n =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"overlapJoin: column name must match [A-Za-z0-9_]+: '$n'"))
    def exploded(df: DataFrame, s: String, e: String, bucket: String) =
      df.where(col(e) > col(s)).withColumn(bucket,
        explode(sequence(expr(s"$s div $bucketMs"), expr(s"($e - 1) div $bucketMs"))))
    exploded(a, aStart, aEnd, "__bucket_a")
      .join(exploded(b, bStart, bEnd, "__bucket_b"),
        col("__bucket_a") === col("__bucket_b") &&
          col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
          col("__bucket_a") ===
            expr(s"greatest($aStart, $bStart) div $bucketMs"))
      .drop("__bucket_a", "__bucket_b")
  }

  /**
   * Peak concurrency of CLOSED intervals — the capacity number ("how many
   * sessions were open at once, and when did it first happen") behind
   * connection-pool and autoscaler sizing. The classic sweep: +1 at each
   * start, −1 at each end, max of the running sum. Distributed end to
   * end: endpoints collapse to one row per distinct instant (an
   * aggregate), the running sum rides
   * [[graft.recon.Sources.withRunningSumRanged]] (two-pass ranged scheme,
   * no single-partition window), and the instant's maximum under
   * starts-before-ends ordering is `cum + minus` — touching intervals
   * (one ends exactly when another starts) count as overlapping.
   *
   * Output: one row `(peak, peak_at)` — the maximum and the earliest
   * instant achieving it.
   */
  def peakConcurrency(df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val pts = df.select(col(startCol).as("t"), lit(1L).as("plus"), lit(0L).as("minus"))
      .union(df.select(col(endCol).as("t"), lit(0L).as("plus"), lit(1L).as("minus")))
      .groupBy(col("t"))
      .agg(sum(col("plus")).as("plus"), sum(col("minus")).as("minus"))
    // cut once: the max pass and the argmin pass share the swept frame
    val swept = graft.recon.Checkpoints.cut(
      graft.recon.Sources.withRunningSumRanged(
          pts, "cum", col("plus") - col("minus"), Seq(col("t")))
        .select(col("t"), (col("cum") + col("minus")).as("inst")))
    val peak = swept.agg(max(col("inst")).as("peak"))
    swept.join(broadcast(peak), col("inst") === col("peak"))
      .groupBy(col("peak")).agg(min(col("t")).as("peak_at"))
      .select(col("peak"), col("peak_at"))
  }
}
