package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchDiffSpec extends AnyFunSuite {
  test("medians extracts only the queries_detail section") {
    val json =
      """{"metric":"total","value":10.5,"unit":"sec",
        |"queries":{"q1":1.25,"q2":0.5},
        |"queries_detail":{"q1":{"median":1.25,"min":1.0,"max":2.0},
        |"q2":{"median":0.5,"min":0.4,"max":0.6}}}""".stripMargin
    val m = graft.tools.BenchDiff.medians(json)
    assert(m == Map("q1" -> 1.25, "q2" -> 0.5))
  }

  test("medians on a detail-only file still parses") {
    val json = """{"a_b":{"median":3.0,"min":1.0,"max":4.0}}"""
    assert(graft.tools.BenchDiff.medians(json) == Map("a_b" -> 3.0))
  }

  test("stats carries the min; reps_s arrays don't confuse the extractor") {
    val json =
      """{"queries_detail":{"q1":{"median":2.09,"min":1.28,"max":3.0,"reps_s":[2.09,1.28,3.0,2.0,2.2]},
        |"q2":{"median":0.5,"min":0.4,"max":0.6,"reps_s":[0.5,0.4,0.6]}}}""".stripMargin
    val s = graft.tools.BenchDiff.stats(json)
    assert(s("q1") == graft.tools.BenchDiff.Stat(2.09, 1.28))
    assert(s("q2") == graft.tools.BenchDiff.Stat(0.5, 0.4))
  }
}
