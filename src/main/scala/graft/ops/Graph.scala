package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph centrality over co-occurrence graphs — the PageRank-style
 * importance signal web-curation pipelines attach to documents and
 * items (Page et al. 1999; the Common-Crawl-derived corpora rank hosts
 * exactly this way before sampling).
 *
 * Exactness: ranks live in integer MICRO-units and every step is
 * integer arithmetic — contributions are `rank div out_degree`, the
 * damping fold is `base + (damp · Σin) div 1000` — so Spark and DuckDB
 * produce bit-identical ranks at any iteration count. Float PageRank
 * would diverge between engines on summation ORDER alone; integer
 * PageRank is associative and exact. The price (sub-micro mass lost to
 * floor) is irrelevant to the ranking use and identical in both arms.
 *
 * Scale shape: each iteration is one co-partitioned join of the rank
 * vector with the edge list on `src` plus one map-side-combined
 * aggregation on `dst` — the canonical Pregel step expressed as
 * DataFrame ops, `iters` bounded and unrolled into one declarative
 * plan. Nothing is collected; the rank vector is node-sized and stays
 * distributed.
 */
object Graph {

  /**
   * Symmetric co-occurrence edges: items sharing a basket key, both
   * directions, distinct. `(src, dst)` long columns. Self-loops dropped.
   * The self-join is an equi-join on the basket key — per-basket fanout
   * is `deg²`, bounded by basket size, never a cartesian.
   */
  def coOccurrenceEdges(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val a = df.select(col(basketCol).as("__b"), col(itemCol).as("src")).distinct()
    val b = df.select(col(basketCol).as("__b"), col(itemCol).as("dst")).distinct()
    a.join(b, Seq("__b"))
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /**
   * Integer PageRank: `iters` damped rounds over a distinct edge list.
   * Every node starts at 1,000,000 micro-units; per round each node
   * sends `rank div out_degree` along each out-edge and folds to
   * `(1000 − dampMilli)·1000 + (dampMilli · Σ in) div 1000`. Nodes are
   * the sources of `edges` (on a symmetric graph: every connected
   * node). Output: `(node, rank_micro)`.
   *
   * Dangling mass: a node with no out-edges is not a source row, so its
   * rank leaks — pass a symmetric edge list (e.g.
   * [[coOccurrenceEdges]]) or pre-add sink back-edges if leakage
   * matters; the ranking semantics here follow the common
   * drop-dangling simplification.
   */
  def pageRank(edges: DataFrame, iters: Int = 3, dampMilli: Int = 850): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampMilli >= 0 && dampMilli <= 1000, s"dampMilli out of range: $dampMilli")
    val base = (1000L - dampMilli) * 1000L
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    // edge list annotated with out-degree once; reused by every round
    val withDeg = edges.join(deg, Seq("src"))
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val in = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        // div, not /: long division through doubles can land one ulp
        // under the true quotient and truncate a full unit
        .select(col("dst"), expr("rank_micro div __deg").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      ranks = deg.select(col("src").as("node"))
        .join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampMilli * coalesce(__in, 0L)) div 1000")).as("rank_micro"))
    }
    ranks
  }
}
