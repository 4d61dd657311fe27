package graft

import graft.ops.Contracts

class ContractsSpec extends SparkSuite {
  import spark.implicits._

  test("fdAudit: a holding FD reports zero violations") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val r = Contracts.fdAudit(df, "k->v", Seq("k"), "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r == (("k->v", 3L, 2L, 0L, 0L, 0L)))
  }

  test("fdAudit: violations count rows outside each lhs's modal rhs (g3)") {
    // k=1: values a,a,b -> 1 repair; k=2: c,d -> 1 repair (modal ties both 1)
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"), (2L, "d"))
      .toDF("k", "v")
    val r = Contracts.fdAudit(df, "fd", Seq("k"), "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r == (("fd", 5L, 2L, 2L, 2L, 400L)))
  }

  test("fdAudit: composite lhs and null rhs as a value") {
    val df = Seq(
      (1L, "x", Some("p")), (1L, "x", None), (1L, "y", Some("p"))
    ).toDF("a", "b", "v")
    val r = Contracts.fdAudit(df, "ab->v", Seq("a", "b"), "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    // lhs (1,x): {p, NULL} -> 1 violation; lhs (1,y): clean
    assert(r._4 == 1L && r._5 == 1L)
  }

  test("rowChecks rejects names that could break the selectExpr quoting") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2L)).toDF("a", "b")
    for (bad <- Seq("it's", "a`b", "x\nnewline", "")) {
      val e = intercept[IllegalArgumentException] {
        graft.ops.Contracts.rowChecks(df,
          Seq(graft.ops.Contracts.Check(bad, col("a") > 0)))
      }
      assert(e.getMessage.contains("check name"), s"name '$bad': ${e.getMessage}")
    }
    // duplicates fail loudly too (the wide row would silently keep one)
    val dup = intercept[IllegalArgumentException] {
      graft.ops.Contracts.rowChecks(df, Seq(
        graft.ops.Contracts.Check("c1", col("a") > 0),
        graft.ops.Contracts.Check("c1", col("b") > 0)))
    }
    assert(dup.getMessage.contains("duplicate"))
    // legal names still work
    val ok = graft.ops.Contracts.rowChecks(df, Seq(
      graft.ops.Contracts.Check("a positive.check-1", col("a") > 0)))
    assert(ok.count() == 1L)
  }

  test("fkOrphans: orphans counted, null keys excused, parent dups harmless") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None, Some(9L))
      .toDF("fk") // 2 orphans (9, 9), 1 null, 2 resolved
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup parent must not double-count
    val r = Contracts.fkOrphans(child, "fk", parent, "pk", "child.fk->parent")
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(r == (("child.fk->parent", 5L, 1L, 2L, Some(400L))))
  }

  test("fkOrphans: empty child reports zero with a null rate, not a raise") {
    val r = Contracts.fkOrphans(Seq.empty[Long].toDF("fk"), "fk",
        Seq(1L).toDF("pk"), "pk", "e")
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(r == (("e", 0L, 0L, 0L, None)))
  }
}
