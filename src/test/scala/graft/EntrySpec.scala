package graft

/** Contract checks on the driver-facing registry. */
class EntrySpec extends SparkSuite {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("query names are unique and non-empty") {
    val specs = graft.demo.ReconQueries.all ++ graft.demo.OpsQueries.all
    assert(specs.map(_.name).distinct.size == specs.size)
    assert(specs.forall(_.name.nonEmpty))
  }

  test("every query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        // the named queries are LEGITIMATELY empty on clean/small data:
        // near-dup pairs below threshold at sf0.001, and audits whose
        // whole point is reporting nothing when nothing is wrong
        if (n == 0 && !Set("dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
            "dedup_embed", "recon_dup_probe", "quality_label_conflicts").contains(name))
          Some(s"$name returned 0 rows")
        else None
      } catch { case e: Throwable => Some(s"$name threw ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
