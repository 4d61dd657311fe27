package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Distributed spectral analysis of an embedding column with EXACT
 * cross-engine arithmetic: power iteration on the (uncentered) second
 * moment C = Σᵣ xᵣxᵣᵀ without ever materializing C — each step is
 * C·v = Σᵣ xᵣ(xᵣ·v), i.e. one per-row dot product and one per-dim sum,
 * two hash aggregations over the exploded (row, dim, value) frame. That
 * is the matrix-free form that scales: state per step is one d-vector,
 * shuffles are keyed by row id then by dim, and nothing grows with the
 * corpus.
 *
 * Exactness: components quantize to `floor(x·10⁶)` (exactly summable
 * integers, the same trick as the drift/centroid queries), every moment
 * rides DECIMAL(38,0), and the iterate is renormalized after each step
 * by an ADAPTIVE integer divisor `max|u| div 10⁸ + 1` — data-dependent
 * but itself exact, so any engine mirroring the computation lands on
 * bit-identical integers at every step. Division uses
 * truncation-toward-zero spelled as `sign(u)·(|u| div s)` because Spark's
 * `div` truncates while DuckDB's `//` floors — they only agree on
 * non-negative operands. With |v| ≤ ~10⁸ and 10⁶-scaled components, the
 * largest moment is n·10¹¹·(d·10¹⁴) — inside DECIMAL(38,0) headroom for
 * any real corpus and dimension.
 */
object Spectral {

  /**
   * Top principal direction of `vecCol` (array&lt;float&gt;, fixed
   * dimension) by `iters` rounds of matrix-free power iteration from the
   * all-ones start vector. Returns one row per dimension:
   * `dim` (0-based), `loading_milli` (signed per-dim share of the
   * direction's L1 mass, exact integer), and `explained_share` (Rayleigh
   * quotient over the trace — the fraction of total energy along the
   * direction; the one double in the output, produced by a fixed-shape
   * expression over exact integers so it is bit-identical across
   * engines). The all-ones start makes the sign deterministic.
   */
  def topDirection(emb: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 4, s"iters out of range [1,4]: $iters")
    val xs = emb.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("__id"), col("dim").cast("long").as("dim"),
        floor(col("__x").cast("double") * 1000000d)
          .cast(DecimalType(38, 0)).as("q"))
    // v0 = all-ones: the first dot product is just the per-row sum
    val dot0 = xs.groupBy(col("__id")).agg(sum(col("q")).as("dt"))
    var u = xs.join(dot0, "__id").groupBy(col("dim"))
      .agg(sum(col("q") * col("dt")).as("u"))
    var vPrev: Option[DataFrame] = None
    for (_ <- 2 to iters) {
      val sc = u.agg((expr("max(abs(u)) div 100000000") + 1).as("sc"))
      val v = u.crossJoin(broadcast(sc))
        .select(col("dim"),
          when(col("u") >= 0, expr("u div sc"))
            .otherwise(-expr("(-u) div sc")).as("v"))
      vPrev = Some(v)
      val dk = xs.join(broadcast(v), "dim").groupBy(col("__id"))
        .agg(sum(col("q") * col("v")).as("dt"))
      u = xs.join(dk, "__id").groupBy(col("dim"))
        .agg(sum(col("q") * col("dt")).as("u"))
    }
    // Rayleigh numerator vᵀCv = Σᵣ(qᵣ·v)² ≥ 0; with v0 = ones, den = d
    val uv = vPrev match {
      case Some(v) => u.join(v, "dim")
        .agg(sum(col("u") * col("v")).as("num"),
          sum(col("v") * col("v")).cast(DecimalType(38, 0)).as("den"),
          sum(abs(col("u"))).as("sabs"))
      case None => u
        .agg(sum(col("u")).as("num"),
          count(lit(1)).cast(DecimalType(38, 0)).as("den"),
          sum(abs(col("u"))).as("sabs"))
    }
    val tr = xs.agg(sum(col("q") * col("q")).as("tr"))
    u.crossJoin(broadcast(uv)).crossJoin(broadcast(tr))
      .select(col("dim"),
        when(col("sabs") === 0, lit(0L))
          .when(col("u") >= 0, expr("(u * 1000) div sabs"))
          .otherwise(-expr("((-u) * 1000) div sabs")).as("loading_milli"),
        when(col("den") === 0 || col("tr") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double")
            / col("tr").cast("double")).as("explained_share"))
  }
}
