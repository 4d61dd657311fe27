package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{AntiEntropy, Sampling}

/** Property tests for the round-11 operator edges: invariants that must
  * hold for ANY input, exercised over seeded random data (same
  * deterministic ScalaCheck discipline as [[ReconPropertySpec]]). */
class OpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forSeeds[T](gen: Gen[T], n: Int)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i")))
    }

  // strings drawn from an alphabet that INCLUDES the historical
  // separator/sentinel bytes and the length-prefix syntax itself — the
  // exact values that could alias under a weaker canonical encoding
  private val trickyStr: Gen[String] = Gen.listOfN(4,
    Gen.oneOf("a", "b", "\u0001", "\u0002", "N", "V2:", ":", "")).map(_.mkString)

  private val genRow: Gen[(String, String, String)] =
    for { a <- trickyStr; b <- trickyStr; c <- trickyStr } yield (a, b, c)

  test("property: anti-entropy digests differ exactly where the rows differ") {
    // 997 buckets over ≤ 8 ids: each id lands in its own bucket for
    // these fixed seeds, so the bucket-diff count equals the number of
    // genuinely differing rows — any canonical-encoding aliasing would
    // show as a missing diff
    forSeeds(Gen.listOfN(8, Gen.zip(genRow, genRow)), 10) { pairs =>
      val left = pairs.zipWithIndex
        .map { case ((l, _), i) => (i.toLong, l._1, l._2, l._3) }
        .toDF("id", "x", "y", "z")
      val right = pairs.zipWithIndex
        .map { case ((_, r), i) => (i.toLong, r._1, r._2, r._3) }
        .toDF("id", "x", "y", "z")
      val cols = Seq("id", "x", "y", "z")
      val nDiffering = pairs.count { case (l, r) => l != r }
      val diff = AntiEntropy.diffDigests(
        AntiEntropy.bucketDigests(left, Seq("id"), cols, 997),
        AntiEntropy.bucketDigests(right, Seq("id"), cols, 997)).count()
      assert(diff == nDiffering.toLong,
        s"expected $nDiffering differing buckets, got $diff for $pairs")
    }
  }

  test("property: exactN samples are nested and exactly sized for any n") {
    val df = (1L to 97L).map(i => (i, i * 31L % 89L)).toDF("doc_id", "v")
    var prev = Set.empty[Long]
    for (n <- Seq(1, 5, 20, 50, 97, 200)) {
      val s = Sampling.exactN(df, "doc_id", n)
        .select("doc_id").as[Long].collect().toSet
      assert(s.size == math.min(n, 97), s"n=$n size=${s.size}")
      assert(prev.subsetOf(s), s"n=$n must contain every smaller sample")
      prev = s
    }
  }

  test("property: capPerStratum never exceeds the cap and keeps small strata whole") {
    forSeeds(Gen.listOfN(60,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 1000000L))), 5) { rows =>
      val df = rows.distinct.toDF("g", "k")
      val before = df.groupBy("g").count().as[(String, Long)].collect().toMap
      val after = Sampling.capPerStratum(df, "g", "k", cap = 7)
        .groupBy("g").count().as[(String, Long)].collect().toMap
      before.foreach { case (g, n) =>
        assert(after.getOrElse(g, 0L) == math.min(n, 7L),
          s"stratum $g: $n -> ${after.get(g)}")
      }
    }
  }
}
