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
}
