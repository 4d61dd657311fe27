package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IncrementalJoin

class IncrementalJoinSpec extends SparkSuite {
  import spark.implicits._

  // multiset canon: duplicates matter for a join delta
  private def bag(df: DataFrame): Map[Seq[Any], Long] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def a = Seq((1L, "a1"), (2L, "a2"), (2L, "a2b")).toDF("k", "av")
  private def da = Seq((2L, "A3"), (3L, "A4")).toDF("k", "av")
  private def b = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "bv")
  private def db = Seq((2L, 21L), (4L, 40L)).toDF("k", "bv")

  test("delta ∪ old join ≡ full recompute, multiset-exactly") {
    val old = a.join(b, Seq("k"))
    val delta = IncrementalJoin.joinDelta(a, da, b, db, Seq("k"))
    val full = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    assert(bag(old.unionByName(delta)) == bag(full))
    // and the delta is not trivially everything: the unchanged pair
    // (1, a1, 10) appears in old only
    assert(!bag(delta).contains(Seq(1L, "a1", 10L)))
  }

  test("empty deltas produce an empty join delta") {
    val none = da.where(lit(false))
    val noneB = db.where(lit(false))
    assert(IncrementalJoin.joinDelta(a, none, b, noneB, Seq("k")).count() == 0L)
  }

  test("duplicate keys multiply through the delta exactly like a real join") {
    // ΔA key 2 must pair with BOTH base-B rows and the ΔB row; the two
    // base-A rows with key 2 each pair with the ΔB row
    val delta = IncrementalJoin.joinDelta(a, da, b, db, Seq("k"))
    assert(delta.where($"k" === 2L).count() ==
      (1L * 1 + 2L * 1 + 1L * 1)) // ΔA⋈B + A⋈ΔB + ΔA⋈ΔB at key 2
  }
}
