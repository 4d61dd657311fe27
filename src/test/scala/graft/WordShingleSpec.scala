package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class WordShingleSpec extends SparkSuite {
  import spark.implicits._

  /** the transform(sequence)/concat_ws composition the kernel replaced —
    * kept here as the equivalence reference. */
  private def composed(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))

  test("native word_shingles is byte-identical to the composed form") {
    val df = Seq(
      "a b c d e",
      "one two three",
      "exact width",
      "short",
      "",
      "unicode éß 中文 mix",
      "  padded   tokens  "
    ).toDF("text").select(graft.ops.TextAnalysis.tokens(col("text")).as("t"))
    for (n <- Seq(1, 2, 3, 5)) {
      val both = df.select(
        TextFunctions.word_shingles(col("t"), n).as("native"),
        composed(col("t"), n).as("composed"))
      assert(both.where(not(col("native") <=> col("composed"))).count() == 0,
        s"kernel diverges from the composed form at n=$n")
    }
  }

  test("null token array yields null; fewer than n tokens yield empty") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))),
      (2L, None: Option[Seq[String]])
    ).toDF("id", "t")
    val out = df.select(col("id"), TextFunctions.word_shingles(col("t"), 3).as("sh"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(out(1L) == Some(Seq.empty))
    assert(out(2L).isEmpty)
  }
}
