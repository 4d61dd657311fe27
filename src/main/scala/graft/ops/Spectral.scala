package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
 * by an ADAPTIVE integer divisor `max|u| div B + 1` — data-dependent but
 * itself exact, so any engine mirroring the computation lands on
 * bit-identical integers at every step. Division uses
 * truncation-toward-zero spelled as `sign(u)·(|u| div s)` because Spark's
 * `div` truncates while DuckDB's `//` floors — they only agree on
 * non-negative operands. With |v| ≤ ~10⁸ and 10⁶-scaled components, the
 * largest moment is n·10¹¹·(d·10¹⁴) — inside DECIMAL(38,0) headroom for
 * any real corpus and dimension; the deflated operator's tighter 10⁴
 * iterate bound keeps its extra vvᵀ products inside the same headroom.
 */
object Spectral {

  private val Dec38 = DecimalType(38, 0)

  /** Exploded, quantized component frame: (__id, dim, q) with
    * q = floor(x·10⁶) as DECIMAL(38,0). Lineage-cut: every C
    * application reads it twice and the trace once more, so the explode
    * materializes once instead of once per consumer (the
    * ngramJaccardPairs shingle-table pattern). */
  private def quantized(emb: DataFrame, idCol: String, vecCol: String) =
    graft.recon.Checkpoints.cut(
      emb.select(col(idCol).as("__id"),
          posexplode(col(vecCol)).as(Seq("dim", "__x")))
        .select(col("__id"), col("dim").cast("long").as("dim"),
          floor(col("__x").cast("double") * 1000000d).cast(Dec38).as("q")))

  /** Truncation-toward-zero rescale of `(dim, valCol)` to |out| ≤ bound,
    * by the adaptive exact divisor `max|val| div bound + 1`. The input
    * is lineage-cut first: it is always a d-row frame, referenced twice
    * here (the divisor aggregate and the division) and again by every
    * downstream step — without the cut each reference re-executes the
    * whole upstream corpus pass, and the iteration DAG doubles per
    * round (measured: Catalyst never finished planning two deflation
    * rounds; with the cuts the plan is linear in the round count). */
  private def rescaled(u: DataFrame, valCol: String, bound: Long,
      outCol: String): DataFrame = {
    val uc = graft.recon.Checkpoints.cut(u)
    // the divisor must STAY decimal: `div` materializes its quotient as
    // a LONG, which silently wraps once max|val| exceeds bound·2⁶³ (a
    // deflation iterate reaches ~10³³) — so floor-divide via the exact
    // identity (x − x % b) / b, whose division has no remainder and is
    // therefore exact in any rounding mode; x ≥ 0 makes floor = trunc
    val sc = uc.agg((expr(
      s"cast((max(abs($valCol)) - max(abs($valCol)) % $bound) / $bound" +
        " as decimal(38,0))") + 1).as("sc"))
    uc.crossJoin(broadcast(sc))
      .select(col("dim"),
        when(col(valCol) >= 0, expr(s"$valCol div sc"))
          .otherwise(-expr(s"(-$valCol) div sc")).as(outCol))
  }

  /** One matrix-free step u ← C·v over the quantized frame. The d-row
    * result is lineage-cut so multi-referencing consumers (Rayleigh
    * stats, deflation's two projector terms) cost one corpus pass
    * total, not one per reference. */
  private def applyC(xs: DataFrame, v: DataFrame, vCol: String): DataFrame = {
    val dt = xs.join(broadcast(v), "dim").groupBy(col("__id"))
      .agg(sum(col("q") * col(vCol)).as("dt"))
    graft.recon.Checkpoints.cut(
      xs.join(dt, "__id").groupBy(col("dim"))
        .agg(sum(col("q") * col("dt")).as("u")))
  }

  /** `iters` power-iteration rounds from the all-ones start. Returns the
    * final unnormalized iterate `(dim, u)` and the rescaled vector that
    * produced it (None when iters = 1: the implicit all-ones v0). */
  private def powerU(xs: DataFrame, iters: Int): (DataFrame, Option[DataFrame]) = {
    val dot0 = xs.groupBy(col("__id")).agg(sum(col("q")).as("dt"))
    var u = graft.recon.Checkpoints.cut(
      xs.join(dot0, "__id").groupBy(col("dim"))
        .agg(sum(col("q") * col("dt")).as("u")))
    var vPrev: Option[DataFrame] = None
    for (_ <- 2 to iters) {
      val v = rescaled(u, "u", 100000000L, "v")
      vPrev = Some(v)
      u = applyC(xs, v, "v")
    }
    (u, vPrev)
  }

  private def signedMilliShare(valCol: String, sabsCol: String): Column =
    when(col(sabsCol) === 0, lit(0L))
      .when(col(valCol) >= 0, expr(s"($valCol * 1000) div $sabsCol"))
      .otherwise(-expr(s"((-$valCol) * 1000) div $sabsCol"))

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
    val xs = quantized(emb, idCol, vecCol)
    val (u, vPrev) = powerU(xs, iters)
    // Rayleigh numerator vᵀCv = Σᵣ(qᵣ·v)² ≥ 0; with v0 = ones, den = d
    val uv = vPrev match {
      case Some(v) => u.join(v, "dim")
        .agg(sum(col("u") * col("v")).as("num"),
          sum(col("v") * col("v")).cast(Dec38).as("den"),
          sum(abs(col("u"))).as("sabs"))
      case None => u
        .agg(sum(col("u")).as("num"),
          count(lit(1)).cast(Dec38).as("den"),
          sum(abs(col("u"))).as("sabs"))
    }
    val tr = xs.agg(sum(col("q") * col("q")).as("tr"))
    u.crossJoin(broadcast(uv)).crossJoin(broadcast(tr))
      .select(col("dim"),
        signedMilliShare("u", "sabs").as("loading_milli"),
        when(col("den") === 0 || col("tr") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double")
            / col("tr").cast("double")).as("explained_share"))
  }

  /**
   * SECOND principal direction by exact-integer deflation: power
   * iteration on T = (vᵀv)·C − v(vᵀC), the top direction scaled out of
   * the operator without ever dividing (multiplying the projector
   * through by vᵀv keeps every step integral — a true Hotelling
   * deflation C − λv̂v̂ᵀ needs a rational λ). T annihilates v and acts as
   * (vᵀv)·C on v's orthogonal complement, so its dominant direction is
   * C's second one. `v` is the [[topDirection]] iterate after
   * `itersTop` rounds, rescaled to |v| ≤ 10⁴; the start vector is the
   * all-ones vector projected off v, and each T-step renormalizes to
   * |w| ≤ 10⁴ so the largest product (vᵀv)·(C·w) stays within
   * DECIMAL(38,0) headroom.
   *
   * Output per dimension: `dim`, `loading_milli` (signed L1 share of
   * the final iterate), `explained_share` (Rayleigh wᵀCw/(wᵀw) over the
   * trace — the energy fraction along the SECOND direction), and
   * `cos_to_top` (cosine between the reported direction and v — a
   * near-zero value is the orthogonality self-check; both doubles are
   * fixed-shape expressions over exact integers). On rank-1 data the
   * deflated iterate is quantization noise renormalized — the READABLE
   * signal is explained_share ≈ 0, not the loadings; only when the
   * residual vanishes exactly (e.g. axis-aligned data) does the iterate
   * collapse to zero with NULL doubles.
   */
  def secondDirection(emb: DataFrame, idCol: String, vecCol: String,
      itersTop: Int = 2, itersDeflate: Int = 2): DataFrame = {
    require(itersTop >= 1 && itersTop <= 4,
      s"itersTop out of range [1,4]: $itersTop")
    require(itersDeflate >= 1 && itersDeflate <= 4,
      s"itersDeflate out of range [1,4]: $itersDeflate")
    val xs = quantized(emb, idCol, vecCol)
    val (u1, _) = powerU(xs, itersTop)
    val vs = rescaled(u1, "u", 10000L, "v")
    val vstats = vs.agg(sum(col("v") * col("v")).cast(Dec38).as("vv"),
      sum(col("v")).cast(Dec38).as("sv"))
    // w0 = (vᵀv)·1 − v·(vᵀ1), the ones vector projected off v
    var w = rescaled(
      vs.crossJoin(broadcast(vstats))
        .select(col("dim"), (col("vv") - col("v") * col("sv")).as("tw")),
      "tw", 10000L, "w")
    for (_ <- 1 to itersDeflate) {
      val cw = applyC(xs, w, "w").withColumnRenamed("u", "cw")
      val j = vs.join(cw, "dim")
      val vc = j.agg(sum(col("v") * col("cw")).as("vc"))
      val tw = j.crossJoin(broadcast(vc))
        .crossJoin(broadcast(vstats.select(col("vv"))))
        .select(col("dim"),
          (col("vv") * col("cw") - col("v") * col("vc")).as("tw"))
      w = rescaled(tw, "tw", 10000L, "w")
    }
    val cwF = applyC(xs, w, "w").withColumnRenamed("u", "cw")
    val st = w.join(cwF, "dim").join(vs, "dim")
      .agg(sum(col("w") * col("cw")).as("num"),
        sum(col("w") * col("w")).cast(Dec38).as("den"),
        sum(abs(col("w"))).cast(Dec38).as("sabs"),
        sum(col("v") * col("w")).cast(Dec38).as("vw"))
    val tr = xs.agg(sum(col("q") * col("q")).as("tr"))
    w.crossJoin(broadcast(st)).crossJoin(broadcast(tr))
      .crossJoin(broadcast(vstats.select(col("vv"))))
      .select(col("dim"),
        signedMilliShare("w", "sabs").as("loading_milli"),
        when(col("den") === 0 || col("tr") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double")
            / col("tr").cast("double")).as("explained_share"),
        when(col("vv") === 0 || col("den") === 0, lit(null).cast("double"))
          .otherwise(col("vw").cast("double") /
            (sqrt(col("vv").cast("double")) * sqrt(col("den").cast("double"))))
          .as("cos_to_top"))
  }
}
