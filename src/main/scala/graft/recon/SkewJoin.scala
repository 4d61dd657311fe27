package graft.recon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys — the manual remedy when AQE's runtime
 * skew-join split isn't available (non-shuffle-join contexts, streaming)
 * or when one hot key dwarfs everything (the classic null/default-value
 * hub). AQE (`spark.sql.adaptive.skewJoin`) is the first line of defense;
 * this operator is the explicit fallback.
 *
 * Mechanics: the large (skewed) side gets a random-but-deterministic salt
 * in [0, saltFactor); the small side is replicated once per salt value.
 * The shuffle key becomes (key, salt), splitting each hot key's rows
 * across `saltFactor` reducers. Row multiplicity is unchanged — each
 * left row meets each matching right row exactly once.
 */
object SkewJoin {

  /** Deterministic pseudo-random salt derived from the whole row of join
    * keys plus a disambiguator column if provided — xxhash64, not rand(),
    * so retries/speculative tasks agree. */
  private def saltOf(cols: Seq[Column], saltFactor: Int): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor)).cast("int")

  /**
   * Inner/left salted join of `skewed` (large, hot-keyed) with `small`
   * (replicated `saltFactor`×). `saltBy` should include a high-cardinality
   * column of the skewed side (e.g. its row id) so a single hot key's rows
   * actually spread across salts.
   */
  def saltedEquiJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[(String, String)],
      saltBy: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // salting preserves multiplicity only when unmatched SMALL-side rows are
    // never emitted: a right/full outer join would emit each unmatched small
    // row once per salt replica (saltFactor duplicates)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin supports inner/left joins only, got '$joinType'")
    val l = skewed.withColumn("__salt_l", saltOf(saltBy.map(col), saltFactor)).alias("__skew_l")
    val r = small
      .withColumn("__salt_r", explode(array((0 until saltFactor).map(lit): _*))).alias("__skew_r")
    val cond = (keys.map { case (lk, rk) =>
      col(s"__skew_l.$lk") === col(s"__skew_r.$rk") } :+
      (col("__salt_l") === col("__salt_r"))).reduce(_ && _)
    l.join(r, cond, joinType).drop("__salt_l", "__salt_r")
  }
}
