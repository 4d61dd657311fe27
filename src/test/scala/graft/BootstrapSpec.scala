package graft

import org.apache.spark.sql.functions._
import graft.ops.Bootstrap

class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  test("poissonWeight: weights in 0..7 with mean ~ 1 over many draws") {
    val draws = spark.range(5000)
      .select(Bootstrap.poissonWeight(col("id").cast("string"), lit(0)).as("w"))
    val stats = draws.agg(min("w"), max("w"), sum("w"), count(lit(1)))
      .as[(Long, Long, Long, Long)].head()
    assert(stats._1 >= 0L && stats._2 <= 7L)
    // Poisson(1) mean is 1; 5000 draws put the sample mean well inside ±5%
    assert(math.abs(stats._3.toDouble / stats._4 - 1.0) < 0.05)
    // and the draw is a pure function of (key, b): same inputs, same weights
    val again = spark.range(5000)
      .select(Bootstrap.poissonWeight(col("id").cast("string"), lit(0)).as("w"))
      .agg(sum("w")).as[Long].head()
    assert(again == stats._3)
  }

  test("meanCi: point estimate is the exact milli mean; CI brackets it on a stable fixture") {
    // two strata with known means: a -> cents 100,200,300 (mean 200000 mc)
    val rows = (1 to 300).map(i => ("a", 100L * (1 + (i % 3)), i.toLong)) ++
      (1 to 300).map(i => ("b", 50L, 1000L + i))
    val df = rows.toDF("g", "cents", "k").repartition(7)
    val out = Bootstrap.meanCi(df, col("g"), col("cents"), col("k"),
        nBoot = 32, loRank = 2, hiRank = 31)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val a = out("a"); val b = out("b")
    assert(a._2 == 300L && a._3 == 200000L)
    // constant stratum: every resample has the same mean, CI collapses
    assert(b._3 == 50000L && b._4 == 50000L && b._5 == 50000L)
    assert(a._4 <= a._3 && a._3 <= a._5)
    // resampling noise on a 300-row stratum stays within a few percent
    assert(a._4 > 180000L && a._5 < 220000L)
  }

  test("meanCi: partition layout does not change the replicates") {
    val rows = (1 to 100).map(i => ("g", (i % 7).toLong * 10, i.toLong))
    def run(parts: Int) =
      Bootstrap.meanCi(rows.toDF("g", "cents", "k").repartition(parts),
        col("g"), col("cents"), col("k"), nBoot = 16, loRank = 1, hiRank = 16)
        .as[(String, Long, Long, Long, Long)].head()
    assert(run(1) == run(13))
  }

  test("meanCi: rank bounds are validated") {
    val df = Seq(("g", 1L, 1L)).toDF("g", "cents", "k")
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(df, col("g"), col("cents"), col("k"), 8, 0, 8)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(df, col("g"), col("cents"), col("k"), 8, 2, 9)
    }
  }
}
