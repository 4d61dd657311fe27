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
}
