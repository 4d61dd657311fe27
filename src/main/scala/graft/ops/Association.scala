package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association rules over baskets (the support/confidence/lift
 * measures of Agrawal & Srikant 1994, restricted to the 2-itemsets
 * that dominate practical use): which items co-occur more than their
 * individual popularity predicts. Curation reads this over (host,
 * near-dup-cluster) or (session, event) baskets the same way retail
 * reads it over orders.
 *
 * Shape: basket-item pairs are DISTINCT-ed (multiplicity within a
 * basket is presence, not weight), item supports are one grouped
 * count, the pair table is the basket self-join (fan-out bounded by
 * basket size squared — prune giant baskets upstream, a 10^6-item
 * basket is a data bug, not a basket) pruned by `minPairCount`
 * BEFORE the measure joins, so only candidate-sized frames carry
 * through. The basket total rides a broadcast one-row frame.
 *
 * support/confidence are exact integer milli (numerators ≤ N·1000,
 * safe to ~9·10^15 baskets); lift is the one IEEE double, computed by
 * the same literal expression order in the oracle so engines agree
 * bit for bit.
 */
object Association {

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long): DataFrame = {
    require(minPairCount >= 1L, s"minPairCount must be >= 1: $minPairCount")
    val baskets = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val nBaskets = baskets.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemN = baskets.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = baskets.select(col("__b"), col("__i").as("ante"))
      .join(baskets.select(col("__b"), col("__i").as("cons")), Seq("__b"))
      .where(col("ante") =!= col("cons"))
      .groupBy(col("ante"), col("cons")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    pairs
      .join(itemN.select(col("__i").as("ante"), col("__ni").as("n_a")), Seq("ante"))
      .join(itemN.select(col("__i").as("cons"), col("__ni").as("n_b")), Seq("cons"))
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_a"), col("n_b"),
        col("__n").as("n_baskets"),
        expr("(n_ab * 1000) div __n").as("support_milli"),
        expr("(n_ab * 1000) div n_a").as("confidence_milli"),
        (col("n_ab").cast("double") * col("__n") / col("n_a") / col("n_b"))
          .as("lift"))
  }
}
