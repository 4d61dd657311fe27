package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_dot

/**
 * Keyword retrieval over a document corpus: BM25 scoring for a fixed term
 * set — the standard "find the docs about X" primitive of a training-data
 * pipeline (topic filtering, contamination checks against benchmark terms,
 * quality-by-query probes).
 *
 * Scale shape: the token explode is filtered to the query terms BEFORE any
 * shuffle (the per-doc term-frequency aggregate only ever sees matching
 * tokens, with the per-doc length riding those rows as a column — no
 * full-corpus length join), document frequencies and the corpus stats are
 * one-row/tiny frames joined via broadcast, and the final top-k is a
 * TakeOrderedAndProject (per-partition heaps + driver merge of k rows) —
 * never a global sort or single-partition window. No UDFs; everything
 * stays in whole-stage codegen.
 *
 * The reference has no text-retrieval surface (its "engine" is
 * reconciliation joins, reference: src/reconciliatior.py) — this is part
 * of the LLM-pipeline extension set.
 */
object Retrieval {

  /**
   * Per-document BM25 score for `terms` (docs matching no term are absent —
   * their score is 0). Output: (idCol, score).
   *
   * `logIdf = true` is the textbook idf `ln(1 + (N - df + 0.5)/(df + 0.5))`;
   * `false` uses the rational core `(N - df + 0.5)/(df + 0.5)` alone — the
   * same value without the log wrap. The log is monotone, and per-term
   * scores are summed either way, so rankings agree except in rare
   * multi-term weighing edge cases; the rational form exists because it is
   * reproducible bit-for-bit in any ANSI SQL engine (the oracle), while
   * `ln` may differ in the last ulp across math libraries.
   */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
      k1: Double = 1.2d, b: Double = 0.75d, logIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val termsLc = terms.map(_.toLowerCase)
    require(termsLc.distinct.size == termsLc.size, "duplicate query terms")

    // corpus stats: one-row frame via map-side partial aggregation — a
    // full scan but never a wide shuffle (token totals are whole numbers,
    // so the double sum is exact and order-independent below 2^53)
    val stats = df.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("double")).as("__s"))

    // term filter BEFORE the tf aggregation, and the per-doc length rides
    // the surviving token rows as a column: the only shuffle carries
    // (doc, matching-term) rows — the full-corpus (doc, dl) frame is
    // never joined, let alone shuffled
    val tok = df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .where(col("__t").isin(termsLc: _*))
    val tf = tok.groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"),
        min(col("__dl")).as("__dl")) // constant within the group
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))

    val scored = tf
      .join(broadcast(dfreq), "__t")
      .crossJoin(broadcast(stats))
    val idfCore = (col("__n") - col("__df") + lit(0.5d)) / (col("__df") + lit(0.5d))
    val idf = if (logIdf) log(lit(1.0d) + idfCore) else idfCore
    val avgdl = col("__s") / col("__n")
    val termScore = idf *
      ((col("__tf") * lit(k1 + 1.0d)) /
        (col("__tf") + lit(k1) * (lit(1.0d - b) + lit(b) * (col("__dl") / avgdl))))

    // fixed-order per-term sum (each per-term aggregate sees at most one
    // row): float addition order is deterministic, unlike a bare
    // sum(score) whose partial-merge order Spark does not fix
    val withScore = scored.withColumn("__score", termScore)
    val perTerm = termsLc.zipWithIndex.map { case (t, i) =>
      sum(when(col("__t") === t, col("__score"))).as(s"__s_$i")
    }
    val total = termsLc.indices
      .map(i => coalesce(col(s"__s_$i"), lit(0.0d)))
      .reduce(_ + _)
    withScore.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol), total.as("score"))
  }

  /**
   * Inverted-index build: one row per distinct term with its document
   * frequency and a BOUNDED posting list (the `maxPostings` lowest doc
   * ids, sorted). The df count sees every (term, doc) pair, but the
   * posting `collect_list` only ever sees rows that survived a
   * term-partitioned `row_number ≤ maxPostings` — a hub term ("the")
   * costs a skewed-but-streaming window key, never an unbounded array in
   * one aggregation buffer. Both shuffles hash on the term.
   *
   * Output: `(term, doc_freq, postings)`.
   */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      maxPostings: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termDocs = df
      .select(col(idCol).as("doc"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .distinct()
    val dfreq = termDocs.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc"))
    val capped = termDocs
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPostings)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc"))).as("postings"))
    dfreq.join(capped, Seq("term"))
  }

  /**
   * Reciprocal-rank fusion (Cormack et al., SIGIR'09 — re-derived) of two
   * ranked retrieval arms — the standard way to combine a lexical (BM25)
   * and a semantic (embedding ANN) ranking without score calibration:
   * `rrf = Σ_arm 1/(kRrf + rank_arm)`, missing-from-an-arm contributes 0.
   *
   * Inputs are already top-k frames (`(idCol, …, rank)`), so the fusion
   * join and final re-rank touch ≤ |a|+|b| ≈ 2k rows — the scale cost
   * lives entirely in the arms, which keep their own contracts (BM25:
   * term-filtered shuffle + TakeOrderedAndProject; ANN: broadcast probe
   * or bucketed LSH). Float discipline: each term is one exact IEEE
   * division of small integers and the two-term sum has a fixed operand
   * order, so the fused score is bit-reproducible in any engine.
   *
   * Output: `(idCol, rrf_score, rank)`, top `k` by fused score
   * (ties → lowest id).
   */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && kRrf >= 1, s"bad k=$k / kRrf=$kRrf")
    val fa = a.select(col(idCol), col("rank").as("__ra"))
    val fb = b.select(col(idCol), col("rank").as("__rb"))
    val term = (r: Column) =>
      coalesce(lit(1.0d) / (lit(kRrf) + r).cast("double"), lit(0.0d))
    val fused = fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("rrf_score", term(col("__ra")) + term(col("__rb")))
    val top = fused.orderBy(col("rrf_score").desc, col(idCol)).limit(k)
    // window over ≤ k rows — bounded by construction
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col(idCol))))
      .select(col(idCol), col("rrf_score"), col("rank"))
  }

  /**
   * Maximal-marginal-relevance diversification (Carbonell & Goldstein,
   * SIGIR 1998): greedily re-rank a per-query candidate list so each
   * pick trades relevance against similarity to what is ALREADY
   * picked — the de-redundancy step between retrieval and a context
   * window (k near-duplicate passages waste the budget k−1 times).
   *
   * Selection rule per round:
   *   argmax over remaining c of
   *     lambdaMilli·rel(c) − (1000−lambdaMilli)·maxSim(c, selected)
   * — the λ∈[0,1] convex form scaled by 1000 so both coefficients are
   * integer literals; rel and sim are the same fp32-accumulated dot
   * kernel the recall harnesses value-check, and every round breaks
   * ties on the candidate id, so the greedy trajectory is fully
   * deterministic. `k` rounds unroll into one declarative plan
   * (joins over candidate-set-sized frames — candidates per query is
   * tens, never the corpus; the corpus stays untouched).
   *
   * Inputs: `candidates` = (query_id, neighbor_id, score) — e.g.
   * [[Similarity.bruteForceTopK]] / ivfpq output; `vectors` = (idCol,
   * vecCol) for the candidate ids (joined once up front). Output:
   * (query_id, neighbor_id, mmr_rank) for the k picks per query.
   */
  def mmrDiversify(candidates: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, lambdaMilli: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      s"lambdaMilli out of [0,1000]: $lambdaMilli")
    val lam = lit(lambdaMilli.toDouble)
    val oneMinus = lit((1000 - lambdaMilli).toDouble)
    // materialize the candidate frame ONCE: every greedy round consumes
    // it (Catalyst re-runs an un-cut subtree per consumer, which made
    // the k rounds re-derive the candidate retrieval k times over)
    val cand = graft.recon.Checkpoints.cut(candidates
      .select(col("query_id"), col("neighbor_id"), col("score").cast("double"))
      .join(vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        Seq("neighbor_id")))
    val byQ = Window.partitionBy(col("query_id"))
    // round 1: pure relevance. Every round's selected set is lineage-
    // cut: without it round r re-executes rounds 1..r−1 (each union
    // consumer re-runs the whole uncut subtree), an O(k²) blowup in
    // executed stages for what is k tiny frames
    var selected = graft.recon.Checkpoints.cut(cand
      .withColumn("__r", row_number().over(
        byQ.orderBy(col("score").desc, col("neighbor_id"))))
      .where(col("__r") === 1)
      .select(col("query_id"), col("neighbor_id"), col("__cv"),
        lit(1L).as("mmr_rank")))
    for (r <- 2 to k) {
      val sel = selected.select(col("query_id"),
        col("neighbor_id").as("__sid"), col("__cv").as("__sv"))
      val remaining = cand.join(
        selected.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val next = remaining.join(sel, Seq("query_id"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(first(col("score")).as("score"), first(col("__cv")).as("__cv"),
          max(vec_dot(col("__cv"), col("__sv")).cast("double")).as("__maxSim"))
        .withColumn("__mmr", lam * col("score") - oneMinus * col("__maxSim"))
        .withColumn("__r", row_number().over(
          byQ.orderBy(col("__mmr").desc, col("neighbor_id"))))
        .where(col("__r") === 1)
        .select(col("query_id"), col("neighbor_id"), col("__cv"),
          lit(r.toLong).as("mmr_rank"))
      selected = graft.recon.Checkpoints.cut(selected.unionByName(next))
    }
    selected.select(col("query_id"), col("neighbor_id"), col("mmr_rank"))
  }

  /**
   * Positional phrase search: every occurrence of an exact n-token
   * phrase, per document — the operator an inverted index grows
   * positions for (term-AND retrieval can say "contains all three
   * words"; only positions can say "consecutively, in this order").
   * The phrase here is derived IN-PLAN as the corpus's most common
   * n-gram (count desc, gram asc — deterministic), broadcast back over
   * the positional n-gram table; swapping in a literal phrase is the
   * same join. The positional table is the only corpus-sized frame;
   * everything downstream is hit-sized.
   */
  def topPhraseMatch(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val g = graft.recon.Checkpoints.cut(
      df.select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("__toks"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(col("doc"),
          posexplode(Dedup.shinglesOfTokens(col("__toks"), n)).as(Seq("pos", "gram"))))
    val top = g.groupBy(col("gram")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("gram")).limit(1).select(col("gram"))
    g.join(broadcast(top), Seq("gram"))
      .groupBy(col("doc"), col("gram"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
      .select(col("doc"), col("gram").as("phrase"), col("n_hits"),
        col("first_pos"))
  }

  /** Top-k documents by BM25 for `terms`, with a deterministic dense rank
    * (ties break on the id). The k-selection is orderBy+limit — Spark plans
    * it as TakeOrderedAndProject (distributed heaps), NOT a global sort;
    * the rank column is stamped on the k surviving rows only. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String, terms: Seq[String], k: Int,
      k1: Double = 1.2d, b: Double = 0.75d, logIdf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = bm25Scores(df, textCol, idCol, terms, k1, b, logIdf)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    // window over ≤ k rows — bounded by construction
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))))
  }

  /**
   * Weighted BM25 with a DATA-driven term set, in exact micro-integers.
   * [[bm25Scores]] needs its terms at plan-build time because its
   * deterministic float total relies on a fixed per-term summation
   * order; a term set that comes out of a DataFrame (query expansion,
   * learned term weights) can't use that trick. This variant makes the
   * per-term score order-free instead: the (deterministic-IEEE) double
   * score is floored to micro-units per (doc, term), weighted in milli
   * (`(micro · w) div 1000`), and integer-summed — associative, so any
   * shuffle/merge order yields the same bits, and any ANSI engine
   * reproduces them. Uses the rational idf core (`logIdf = false`
   * semantics). Output: (idCol, score_micro); docs matching no term are
   * absent. `terms`: (term, weight_milli) — small, broadcast.
   */
  def bm25MicroWeighted(df: DataFrame, textCol: String, idCol: String,
      terms: DataFrame, k1: Double = 1.2d, b: Double = 0.75d): DataFrame = {
    val stats = df.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("double")).as("__s"))
    val tok = df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .join(broadcast(terms.select(col("term").as("__t"),
        col("weight_milli").cast("long").as("__w"))), Seq("__t"))
    val tf = tok.groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"),
        min(col("__dl")).as("__dl"), min(col("__w")).as("__w"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
    val idf = (col("__n") - col("__df") + lit(0.5d)) / (col("__df") + lit(0.5d))
    val tfPart = (col("__tf") * lit(k1 + 1.0d)) /
      (col("__tf") + lit(k1) * (lit(1.0d - b) + lit(b) * (col("__dl") / (col("__s") / col("__n")))))
    tf.join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(stats))
      .withColumn("__micro", floor((idf * tfPart) * lit(1000000.0d)).cast("long"))
      .withColumn("__c", expr("(__micro * __w) div 1000"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("score_micro"))
  }

  /**
   * Pseudo-relevance feedback (RM3-lite): score the seed terms, take
   * the top `fbDocs` documents as implicit relevance judgments, mine
   * their most frequent non-seed terms (capped at a corpus document
   * frequency of `maxDfMilli`/1000 — boilerplate never becomes an
   * expansion term), and re-score the corpus with seed terms at weight
   * 1.0 and the `expTerms` expansion terms at `betaMilli`/1000. The
   * whole loop is IN-PLAN — expansion terms are a broadcast frame, not
   * a collected list — and every ranking step is an integer order
   * (micro scores, term counts), so the expanded query is deterministic
   * end to end. Feedback and expansion frames are ≤ fbDocs/expTerms
   * rows; the only corpus-scale work is two scoring passes and one
   * token-df aggregate. Output: top-`k` (idCol, score_micro, rank).
   */
  def prfTopK(df: DataFrame, textCol: String, idCol: String,
      seedTerms: Seq[String], k: Int, fbDocs: Int = 5, expTerms: Int = 3,
      betaMilli: Int = 500, maxDfMilli: Int = 400,
      k1: Double = 1.2d, b: Double = 0.75d): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seedTerms.nonEmpty, "prf needs at least one seed term")
    require(betaMilli >= 0 && maxDfMilli >= 1 && fbDocs >= 1 && expTerms >= 0,
      s"bad prf params: beta=$betaMilli maxDf=$maxDfMilli fb=$fbDocs exp=$expTerms")
    val seedsLc = seedTerms.map(_.toLowerCase)
    require(seedsLc.distinct.size == seedsLc.size, "duplicate seed terms")
    val spark = df.sparkSession
    import spark.implicits._
    val seedDf = seedsLc.map(t => (t, 1000L)).toDF("term", "weight_milli")
    val fb = bm25MicroWeighted(df, textCol, idCol, seedDf, k1, b)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(fbDocs)
      .select(col(idCol))
    val nDocs = df.agg(count(lit(1)).as("__nd"))
    val corpusDf = df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("__dfd"))
    val expansion = df.join(broadcast(fb), Seq(idCol))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(!col("term").isin(seedsLc: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
      .join(corpusDf, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .where(col("__dfd") * 1000 <= col("__nd") * maxDfMilli)
      .orderBy(col("__cnt").desc, col("term"))
      .limit(expTerms)
      .select(col("term"), lit(betaMilli.toLong).as("weight_milli"))
    val top = bm25MicroWeighted(df, textCol, idCol,
        seedDf.unionByName(expansion), k1, b)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
    // window over ≤ k rows — bounded by construction
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score_micro").desc, col(idCol))))
  }

  /**
   * Normalized truncated-RBO weights in micro, exact: with `p = pMilli/
   * 1000 = a/b`, depth d's weight `(1−p)·p^(d−1) / (1−p^k)` is the
   * rational `(b−a)·a^(d−1)·b^(k−d) / (b^k − a^k)` — computed in BigInt
   * and floored once to micro, so BOTH engines consume the same integer
   * literals and no `pow`/libm call exists anywhere (the [[Similarity]]
   * NDCG-discount convention). Weights sum to ~10⁶ (short by ≤ k from
   * the floors): two identical rankings score rbo_micro ≈ 10⁶.
   */
  def rboWeightsMicro(pMilli: Int, k: Int): Seq[Long] = {
    require(pMilli > 0 && pMilli < 1000, s"pMilli must be in (0, 1000): $pMilli")
    require(k >= 1, s"k must be >= 1: $k")
    val a = BigInt(pMilli); val b = BigInt(1000)
    val den = b.pow(k) - a.pow(k)
    (1 to k).map { d =>
      ((BigInt(1000000) * (b - a) * a.pow(d - 1) * b.pow(k - d)) / den).toLong
    }
  }

  /**
   * Rank-biased overlap (Webber et al. 2010), truncated at depth `k`,
   * between two rankers' per-query top lists — "do these rankers agree,
   * weighted toward the top" with a tunable patience `p` (depth d
   * carries weight ∝ p^(d−1)): the ranking-comparison number behind
   * "can the cheap ranker replace the expensive one", where plain
   * set-recall ignores ORDER and Spearman needs both lists complete.
   * Inputs are two `(queryCol, idCol, rankCol)` frames (ranks 1-based,
   * e.g. [[Similarity.bruteForceTopK]] output); rows past `k` are
   * ignored.
   *
   * Exact arithmetic: rbo_micro = Σ_d (W_d · |S_d ∩ T_d|) div d with
   * [[rboWeightsMicro]] literals — per-depth floor, mirrored verbatim
   * by the oracle. Overlap counts come from ONE equi-join on
   * (query, id) — a doc in both prefixes contributes to every depth ≥
   * max(rank_A, rank_B) via a k-row broadcast depth table, so the
   * shuffle carries only the intersection pairs, never |corpus| rows.
   * Queries with disjoint lists score 0 (kept via a left join from
   * ranker A's query set). Output: `(queryCol, overlap_k, rbo_micro)`.
   */
  def rboMicro(rankA: DataFrame, rankB: DataFrame, queryCol: String,
      idCol: String, rankCol: String, pMilli: Int, k: Int): DataFrame = {
    val w = rboWeightsMicro(pMilli, k)
    val spark = rankA.sparkSession
    import spark.implicits._
    val depths = broadcast(
      w.zipWithIndex.map { case (wd, i) => (i + 1L, wd) }.toDF("__d", "__w"))
    val a = rankA.select(col(queryCol), col(idCol), col(rankCol).as("__ra"))
      .where(col("__ra") <= k)
    val b = rankB.select(col(queryCol), col(idCol), col(rankCol).as("__rb"))
      .where(col("__rb") <= k)
    val pairs = a.join(b, Seq(queryCol, idCol))
      .select(col(queryCol), greatest(col("__ra"), col("__rb")).as("__m"))
    val perDepth = pairs.join(depths, col("__m") <= col("__d"))
      .groupBy(col(queryCol), col("__d"), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val per = perDepth.groupBy(col(queryCol))
      .agg(sum(expr("(__w * __c) div __d")).as("__rbo"),
        max(when(col("__d") === k, col("__c"))).as("__ok"))
    a.select(col(queryCol)).distinct()
      .join(per, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("__ok"), lit(0L)).as("overlap_k"),
        coalesce(col("__rbo"), lit(0L)).as("rbo_micro"))
  }
}
