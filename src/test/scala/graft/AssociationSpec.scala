package graft

import graft.ops.Association

class AssociationSpec extends SparkSuite {
  import spark.implicits._

  // baskets: {A,B}, {A,B}, {A,C}, {B} — n=4, nA=3, nB=3, nC=1, nAB=2
  private def baskets = Seq(
    (1L, 10L), (1L, 20L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 30L),
    (4L, 20L)
  ).toDF("basket", "item")

  test("support/confidence exact milli; lift matches the closed form") {
    val r = Association.pairRules(baskets, "basket", "item", minPairCount = 2L)
      .where($"ante" === 10L && $"cons" === 20L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double)].head()
    // (cons, ante) join order puts cons first? select fixes order: ante, cons, ...
    assert(r._1 == 10L && r._2 == 20L)
    assert((r._3, r._4, r._5, r._6) == ((2L, 3L, 3L, 4L)))
    assert(r._7 == 500L)           // support 2/4
    assert(r._8 == 666L)           // confidence 2/3 floored milli
    assert(r._9 == 2.0 * 4 / 3 / 3) // lift ≈ 0.888…
  }

  test("minPairCount prunes singleton pairs; duplicates inside a basket don't inflate") {
    val withDup = baskets.unionAll(Seq((3L, 10L)).toDF("basket", "item"))
    val pairs = Association.pairRules(withDup, "basket", "item", minPairCount = 2L)
      .select("ante", "cons").as[(Long, Long)].collect().toSet
    // only {10,20} reaches 2 baskets; the duplicated (3,10) adds nothing
    assert(pairs == Set((10L, 20L), (20L, 10L)))
  }
}
