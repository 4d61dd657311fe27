package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class TokenBudgetSpec extends SparkSuite {
  import spark.implicits._

  // one row per (source, token) unit so sum(lit(1)) plays the token count
  private def corpus(counts: (String, Int)*) =
    counts.flatMap { case (s, n) => Seq.fill(n)(s) }.toDF("source")

  private def alloc(df: org.apache.spark.sql.DataFrame, budgetMilli: Int) =
    Sampling.tokenBudget(df, "source", lit(1L), budgetMilli)
      .select("source", "n_tokens", "alloc_tokens", "capped")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap

  test("small sources served in full, the large one takes the remainder") {
    // totals (10,20,100), budget 500 milli -> B=65: 10 and 20 full,
    // the 100-source capped at 65-30=35
    val a = alloc(corpus("a" -> 10, "b" -> 20, "c" -> 100), 500)
    assert(a("a") == ("a", 10L, 10L, 0L))
    assert(a("b") == ("b", 20L, 20L, 0L))
    assert(a("c") == ("c", 100L, 35L, 1L))
  }

  test("integer remainder units go one each to the largest capped strata") {
    // totals (5,7,9,9), budget 700 milli -> B=21: 5 full; capped level
    // floor(16/3)=5 with remainder 1 -> the LAST ascending stratum
    // (largest n, then largest name) gets the extra unit
    val a = alloc(corpus("a" -> 5, "b" -> 7, "c" -> 9, "d" -> 9), 700)
    assert(a("a") == ("a", 5L, 5L, 0L))
    assert(a("b") == ("b", 7L, 5L, 1L))
    assert(a("c") == ("c", 9L, 5L, 1L))
    assert(a("d") == ("d", 9L, 6L, 1L))
    assert(a.values.map(_._3).sum == 21L)
  }

  test("budget at or above total serves everything in full") {
    val a = alloc(corpus("a" -> 3, "b" -> 8), 1000)
    assert(a("a") == ("a", 3L, 3L, 0L))
    assert(a("b") == ("b", 8L, 8L, 0L))
  }

  test("budgetSample keeps full strata whole and gates capped strata deterministically") {
    // keyed corpus: (source, key); token weight 1 per row
    val rows = (1 to 10).map(i => ("small", i.toLong)) ++
      (1 to 200).map(i => ("big", 100L + i))
    val df = rows.toDF("source", "key")
    // budget 500: total 210 -> B=105; small (10) full, big capped at 95
    val kept = Sampling.budgetSample(df, "source", "key", lit(1L), budgetMilli = 500)
      .select("source", "key").as[(String, Long)].collect()
    val (smallKept, bigKept) = kept.partition(_._1 == "small")
    assert(smallKept.length == 10)                   // threshold 2^60: whole stratum
    assert(bigKept.length < 200 && bigKept.nonEmpty) // gated subset
    // deterministic and layout-independent
    val again = Sampling.budgetSample(df.repartition(7), "source", "key", lit(1L), 500)
      .select("source", "key").as[(String, Long)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("allocation is exact and capped on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Sampling.tokenBudget(docs, "source",
      graft.ops.TextAnalysis.tokenCount(col("text")), budgetMilli = 600)
    val rows = out.select("n_tokens", "alloc_tokens")
      .as[(Long, Long)].collect()
    val total = rows.map(_._1).sum
    val budget = total * 600 / 1000
    assert(rows.map(_._2).sum == budget)         // Σ alloc = B exactly
    assert(rows.forall { case (n, al) => al <= n }) // never over-drawn
  }

  test("mixEpochs: exact targets, repetition factors, and the status ladder") {
    val df = corpus("en" -> 100, "zh" -> 20, "es" -> 30)
    val out = Sampling.mixEpochs(df, "source", lit(1L),
        Seq("en" -> 500L, "zh" -> 400L, "pt" -> 100L), budgetTokens = 100L)
      .select("source", "n_tokens", "target_tokens", "epochs_milli", "status")
      .as[(String, Long, Long, Option[Long], String)]
      .collect().map(r => r._1 -> r).toMap
    // en: 100 avail, target 50 -> half an epoch
    assert(out("en") == (("en", 100L, 50L, Some(500L), "ok")))
    // zh: 20 avail, target 40 -> repeats twice
    assert(out("zh") == (("zh", 20L, 40L, Some(2000L), "repeats")))
    // pt: weighted but absent — the loud planning failure
    assert(out("pt") == (("pt", 0L, 10L, None, "unavailable")))
    // es: present but unweighted — target 0
    assert(out("es") == (("es", 30L, 0L, Some(0L), "unweighted")))
  }

  test("capPerStratum: clips only over-cap strata, deterministic hash order") {
    val df = (1L to 30L).map(i => (if (i <= 25) "big" else "small", i))
      .toDF("source", "doc_id")
    val out = Sampling.capPerStratum(df, "source", "doc_id", cap = 10)
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 10L, "small" -> 5L)) // small passes whole
    assert(out.agg(max("keep_rank")).as[Long].head() <= 10L)
    // deterministic: the same corpus keeps the same rows on every run
    val again = Sampling.capPerStratum(df, "source", "doc_id", cap = 10)
    assert(rowsOf(out) == rowsOf(again))
    // and the kept set is hash-chosen, not the first 10 ids
    val keptBig = out.where($"source" === "big")
      .select("doc_id").as[Long].collect().toSet
    assert(keptBig != (1L to 10L).toSet)
  }

  test("exactN: exactly n rows, deterministic, and monotone in n (nested samples)") {
    val df = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "v")
    val s20 = Sampling.exactN(df, "doc_id", 20)
    assert(s20.count() == 20L)
    assert(rowsOf(s20) == rowsOf(Sampling.exactN(df, "doc_id", 20)))
    // hash order makes samples NESTED: the 20-sample is a subset of the
    // 50-sample — grow an eval set without resampling history
    val ids20 = s20.select("doc_id").as[Long].collect().toSet
    val ids50 = Sampling.exactN(df, "doc_id", 50).select("doc_id").as[Long].collect().toSet
    assert(ids20.subsetOf(ids50))
    // and it is not just the first n ids
    assert(ids20 != (1L to 20L).toSet)
  }

  test("mixEpochs rejects negative weights and budgets") {
    val df = corpus("en" -> 1)
    intercept[IllegalArgumentException] {
      Sampling.mixEpochs(df, "source", lit(1L), Seq("en" -> -1L), 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixEpochs(df, "source", lit(1L), Seq("en" -> 1L), -10L)
    }
  }
}
