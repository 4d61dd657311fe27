package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** Round 8 shipped a Verify run where 14 queries failed and the run still
  * LOOKED complete (failures only on stderr). These pin the terminal
  * summary: a forced failure must land in the failed list and the JSON
  * line, and must not stop later queries from dumping. */
class VerifySpec extends SparkSuite {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")
  private val bad: (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException("boom")

  test("runAll reports the forced failure and keeps going") {
    val out = Files.createTempDirectory("verify_spec").toFile
    out.deleteOnExit()
    val failed = Verify.runAll(spark, sf, out.getAbsolutePath,
      Seq("a_ok" -> good, "b_boom" -> bad, "c_ok" -> good))
    assert(failed === Seq("b_boom"))
    // the queries after the failure still dumped
    assert(new java.io.File(out, "a_ok").exists())
    assert(new java.io.File(out, "c_ok").exists())
    assert(!new java.io.File(out, "b_boom").exists())
  }

  test("summary JSON carries the failures") {
    assert(Verify.summaryJson(Nil) === """{"failed":[],"n_failed":0}""")
    assert(Verify.summaryJson(Seq("z", "a")) ===
      """{"failed":["a","z"],"n_failed":2}""")
  }
}
