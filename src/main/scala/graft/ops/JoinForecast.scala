package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join-size forecasting from count tables: `|A ⋈ B| = Σ_k f_A(k)·f_B(k)`
 * computed EXACTLY by joining the two per-key count frames — never the
 * data. At 100 TB this is the difference between planning a join and
 * discovering it: the count frames are distinct-key-sized (map-side
 * combined), their join shuffles keys not rows, and the answer tells
 * you whether the real join's output is 10^9 or 10^13 rows BEFORE you
 * commit a cluster to it.
 *
 * [[skewTopK]] is the companion diagnostic: the keys contributing the
 * most output pairs — exactly the salting / AQE-skew-hint candidates,
 * with their share of the total output in milli-units. A single key
 * owning 30% of a joint output is the #1 cause of the one-straggler
 * stage; this names it ahead of time.
 */
object JoinForecast {

  private def counts(df: DataFrame, keys: Seq[String], as: String) =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(as))

  /** One row: input sizes, overlapping key count, and the exact output
    * row count of the equi-join on `keys` — computed without running it.
    * `n_output_rows` is DECIMAL(38,0): the whole point of the forecast is
    * the catastrophic tier (a hub key driving 10¹³⁺ pairs), and exactly
    * there a Long `Σ f_A·f_B` would wrap silently under Spark's non-ANSI
    * arithmetic — a guard reading a wrapped small-positive forecast would
    * wave the explosion through. Decimal keeps the sum exact to 10³⁸. */
  def joinSizeEstimate(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "no join keys")
    val ca = counts(a, keys, "__fa")
    val cb = counts(b, keys, "__fb")
    val joined = ca.join(cb, keys)
      .select((col("__fa").cast("decimal(38,0)") * col("__fb")).as("__pairs"))
    joined.agg(count(lit(1)).as("n_overlap_keys"),
        coalesce(sum(col("__pairs")), lit(0L).cast("decimal(38,0)"))
          .as("n_output_rows"))
      .crossJoin(broadcast(ca.agg(coalesce(sum(col("__fa")), lit(0L)).as("n_left"))))
      .crossJoin(broadcast(cb.agg(coalesce(sum(col("__fb")), lit(0L)).as("n_right"))))
      .select(col("n_left"), col("n_right"), col("n_overlap_keys"), col("n_output_rows"))
  }

  /** The `k` join keys contributing the most output pairs (ties → key
    * order), each with its exact pair count and milli share of the
    * total join output — the salting candidate list. `n_pairs` rides
    * DECIMAL(38,0) for the same reason as [[joinSizeEstimate]]: the keys
    * this ranks are precisely the ones whose f_A·f_B can wrap a Long. */
  def skewTopK(a: DataFrame, b: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(keys.nonEmpty, "no join keys")
    require(k >= 1, s"k must be >= 1: $k")
    val pairs = counts(a, keys, "__fa").join(counts(b, keys, "__fb"), keys)
      .select(keys.map(col) :+
        (col("__fa").cast("decimal(38,0)") * col("__fb")).as("n_pairs"): _*)
    val total = pairs
      .agg(coalesce(sum(col("n_pairs")), lit(0L).cast("decimal(38,0)")).as("__tot"))
    // two-phase top-k: the count frame is key-sized, which at lake
    // scale is still too big for one global sort window — prune to k
    // per partition first (partition-id-grouped window, the bounded
    // shape), then rank globally over ≤ k·partitions survivors
    val ord = Seq(col("n_pairs").desc, struct(keys.map(col): _*).asc)
    val local = pairs.withColumn("__pid", spark_partition_id())
      .withColumn("__lrk",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(ord: _*)))
      .where(col("__lrk") <= k)
    local.withColumn("__rk", row_number().over(Window.orderBy(ord: _*)))
      .where(col("__rk") <= k)
      .crossJoin(broadcast(total))
      .select(keys.map(col) ++ Seq(col("n_pairs"),
        expr("(n_pairs * 1000) div __tot").as("share_milli"),
        col("__rk").as("rank")): _*)
  }
}
