package graft

import org.apache.spark.sql.functions._
import graft.ops.Spectral

class SpectralSpec extends SparkSuite {
  import spark.implicits._

  private def run(vecs: Seq[Seq[Float]], iters: Int) =
    Spectral.topDirection(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").repartition(5),
      "vec_id", "embedding", iters)

  test("topDirection: dominant axis wins and explains most energy") {
    // energy concentrated on dim 1 with small noise elsewhere
    val vecs = (0 until 40).map { i =>
      Seq(0.01f * (i % 3), 1.0f + 0.001f * i, 0.02f * (i % 2))
    }
    val rows = run(vecs, iters = 2)
      .select("dim", "loading_milli", "explained_share")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val byAbs = rows.maxBy(r => math.abs(r._2))
    assert(byAbs._1 == 1L, s"dominant dim should be 1: ${rows.toSeq}")
    assert(math.abs(byAbs._2) > 900, s"dim 1 should carry >90% of L1 mass: $byAbs")
    assert(rows.head._3 > 0.95, s"explained share should be ~1: ${rows.head._3}")
    // loadings sum consistency: milli magnitudes bounded by 1000
    assert(rows.forall(r => math.abs(r._2) <= 1000))
  }

  test("topDirection: layout-independent and deterministic across iters") {
    val vecs = (0 until 30).map { i =>
      Seq((i % 5).toFloat, (i % 7).toFloat, 1.0f, -(i % 3).toFloat)
    }
    def collect(parts: Int, iters: Int) =
      Spectral.topDirection(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", iters)
        .select("dim", "loading_milli", "explained_share")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(collect(2, 2) == collect(9, 2)) // exact, bit-identical
    // more iterations concentrate the Rayleigh quotient (monotone here)
    val e1 = collect(3, 1).head._3
    val e3 = collect(3, 3).head._3
    assert(e3 >= e1 - 1e-12, s"iters should not lose energy: $e1 -> $e3")
  }

  test("topDirection: single-direction data gives explained_share ~ 1") {
    val base = Seq(0.5f, -0.25f, 0.25f)
    val vecs = (1 to 20).map(k => base.map(_ * k))
    val r = run(vecs, iters = 2)
      .select("explained_share").as[Double].head()
    assert(r > 0.999999, s"rank-1 data must be fully explained: $r")
  }

  test("topDirection: rejects out-of-range iters") {
    intercept[IllegalArgumentException] { run(Seq(Seq(1f, 2f)), iters = 0) }
    intercept[IllegalArgumentException] { run(Seq(Seq(1f, 2f)), iters = 5) }
  }

  private def run2(vecs: Seq[Seq[Float]]) =
    Spectral.secondDirection(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding").repartition(5),
      "vec_id", "embedding", itersTop = 2, itersDeflate = 2)
      .select("dim", "loading_milli", "explained_share", "cos_to_top")
      .as[(Long, Long, Option[Double], Option[Double])].collect().sortBy(_._1)

  test("secondDirection: recovers the second axis, near-orthogonal to the first") {
    // dominant axis = dim 0 (amplitude 10), second = dim 2 (amplitude 3
    // at half the top's frequency pattern), noise floor on dim 1/3
    val vecs = (0 until 60).map { i =>
      Seq(10f + 0.1f * (i % 4), 0.01f * (i % 2),
        3f * (if (i % 2 == 0) 1 else -1), 0.02f * (i % 3))
    }
    val rows = run2(vecs)
    val top = rows.maxBy(r => math.abs(r._2))
    assert(top._1 == 2L, s"second direction should be dim 2: ${rows.toSeq}")
    assert(math.abs(top._2) > 900, s"dim 2 should dominate: $top")
    val cos = rows.head._4.get
    assert(math.abs(cos) < 0.05, s"should be near-orthogonal to top: $cos")
    val share = rows.head._3.get
    assert(share > 0.0 && share < 0.5, s"second axis carries minor energy: $share")
  }

  test("secondDirection: rank-1 data reports ~zero second-axis energy") {
    // generic rank-1: integer truncation leaves a noise residual that the
    // adaptive rescale renormalizes — the SIGNAL is explained_share ~ 0
    val base = Seq(0.5f, -0.25f, 0.25f)
    val vecs = (1 to 20).map(k => base.map(_ * k))
    val rows = run2(vecs)
    assert(rows.forall(r => r._3.exists(_ < 1e-6)),
      s"rank-1: second axis carries ~no energy: ${rows.toSeq}")
    assert(rows.forall(r => r._4.exists(c => math.abs(c) < 0.01)),
      s"rank-1: still near-orthogonal: ${rows.toSeq}")
  }

  test("secondDirection: axis-aligned rank-1 degenerates to exact zero/NULLs") {
    // along a coordinate axis the projected residual vanishes EXACTLY:
    // the deflated iterate is the zero vector, loadings 0, doubles NULL
    val vecs = (1 to 20).map(k => Seq(0.25f * k, 0f, 0f))
    val rows = run2(vecs)
    assert(rows.forall(_._2 == 0L), s"all loadings zero: ${rows.toSeq}")
    assert(rows.forall(r => r._3.isEmpty && r._4.isEmpty),
      s"doubles NULL: ${rows.toSeq}")
  }

  test("secondDirection: layout-independent bit-exact") {
    val vecs = (0 until 30).map { i =>
      Seq((i % 5).toFloat, (i % 7).toFloat, 1.0f, -(i % 3).toFloat)
    }
    def collect(parts: Int) =
      Spectral.secondDirection(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", 2, 2)
        .select("dim", "loading_milli", "explained_share", "cos_to_top")
        .as[(Long, Long, Option[Double], Option[Double])]
        .collect().sortBy(_._1).toSeq
    assert(collect(2) == collect(9))
  }
}
