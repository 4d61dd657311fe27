package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._

/**
 * Round-6 sketch / filter-bundle queries: fixed-memory distinct
 * counting, bloom-pre-filtered joins, heuristic document filters, and
 * quality-aware near-dup canonicalization. Same contract as
 * [[OpsQueries]]: every entry pairs the Spark implementation with its
 * exact DuckDB mirror.
 */
object SketchQueries {

  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")
  private def events(s: SparkSession, d: String) =
    s.read.parquet(s"$d/events.parquet")

  /** the tokens CTE shared by the token-level mirrors (matches
    * [[graft.ops.TextAnalysis.tokens]]: lowercased, blank → []). */
  private val TokensCte =
    raw"""tt AS (SELECT lang, CASE WHEN length(trim(text)) = 0 THEN []
         |          ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
         |tok AS (SELECT lang, unnest(t) AS tok FROM tt)""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // HyperLogLog distinct-token count per language: the fixed-memory
    // alternative to count(DISTINCT) — the shuffle carries at most 64
    // (lang, bucket, rho) rows per stratum regardless of cardinality.
    // Portable construction (md5-60 hash, bin() bit-length, exact integer
    // harmonic sum), so registers AND estimate are cross-engine exact;
    // only the log-based small-range correction is left to the spec
    QuerySpec("text_distinct_hll",
      raw"""WITH $TokensCte,
           |hh AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
           |rr AS (SELECT lang, h % 64 AS bucket,
           |         CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END AS rho
           |       FROM hh),
           |reg AS (SELECT lang, bucket, max(rho) AS rho FROM rr GROUP BY 1, 2),
           |agg AS (SELECT lang,
           |          64 - count(*) AS n_zero_registers,
           |          CAST(sum(CAST(1 AS BIGINT) << CAST(55 - rho AS INTEGER))
           |               + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS BIGINT) AS s_scaled
           |        FROM reg GROUP BY 1)
           |SELECT lang, n_zero_registers, s_scaled,
           |  ${Sketches.EstimateNumerator} / CAST(s_scaled AS DOUBLE) AS raw_estimate
           |FROM agg""".stripMargin) { (s, d) =>
      val toks = docs(s, d)
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Sketches.hllEstimate(toks, "lang", col("tok"))
    },

    // bloom-pre-filtered semi-join: all events of users who ever had a
    // high-value error. The bloom bit-test drops non-candidate probe rows
    // at the scan before the only shuffle; the exact semi-join removes
    // false positives, so the oracle is the PLAIN semi-join — bloom
    // internals never surface in the result
    QuerySpec("events_bloom_semi",
      raw"""SELECT e.event_id, e.user_id, e.event_type, e.value FROM events e
           |WHERE EXISTS (SELECT 1 FROM events b
           |  WHERE b.user_id = e.user_id AND b.event_type = 'error' AND b.value > 200)""".stripMargin) {
      (s, d) =>
        val ev = events(s, d)
        val flagged = ev.where(col("event_type") === "error" && col("value") > 200.0)
          .select(col("user_id"))
        Bloom.semiJoin(ev.select(col("event_id"), col("user_id"), col("event_type"), col("value")),
          flagged, "user_id")
    },

    // Gopher/C4-style heuristic filter bundle: structural prose signals +
    // one conjunctive keep verdict, every float a ratio of exact integers
    QuerySpec("text_gopher_filters",
      raw"""WITH w AS (
           |  SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS words,
           |    list_transform(string_split(text, chr(10)), l -> trim(l)) AS lines,
           |    CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS BIGINT) AS n_sym
           |  FROM documents),
           |f AS (
           |  SELECT doc_id,
           |    CAST(len(words) AS BIGINT) AS n_words,
           |    CASE WHEN len(words) = 0 THEN 0.0
           |         ELSE CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
           |              / CAST(len(words) AS DOUBLE) END AS mean_word_len,
           |    CAST(list_sum(list_transform(lines, l ->
           |      CASE WHEN starts_with(l, '-') OR starts_with(l, '*') OR starts_with(l, '•')
           |           THEN 1 ELSE 0 END)) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS bullet_line_frac,
           |    CAST(list_sum(list_transform(lines, l ->
           |      CASE WHEN ends_with(l, '...') OR ends_with(l, '…')
           |           THEN 1 ELSE 0 END)) AS DOUBLE) / CAST(len(lines) AS DOUBLE) AS ellipsis_line_frac,
           |    CASE WHEN len(words) = 0 THEN 0.0
           |         ELSE CAST(n_sym AS DOUBLE) / CAST(len(words) AS DOUBLE) END AS symbol_word_ratio,
           |    ${TextAnalysis.GopherStopwords
             .map(sw => s"CASE WHEN list_contains(words, '$sw') THEN 1 ELSE 0 END")
             .mkString(" + ")} AS n_stopword_hits
           |  FROM w)
           |SELECT doc_id, n_words, mean_word_len, bullet_line_frac, ellipsis_line_frac,
           |  symbol_word_ratio, CAST(n_stopword_hits AS INTEGER) AS n_stopword_hits,
           |  (n_words >= 10 AND n_words <= 1000000
           |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
           |   AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
           |   AND symbol_word_ratio <= 0.1 AND n_stopword_hits >= 2) AS keep
           |FROM f""".stripMargin) { (s, d) =>
      TextAnalysis.gopherFilters(docs(s, d), "text", "doc_id")
    },

    // quality-aware canonicalization: near-dup clusters (simhash pairs →
    // connected components) each elect the member with the highest
    // quality score (tie → lowest id) — detect → cluster → CHOOSE, the
    // step plain dedupByComponents (min-id survivor) skips
    QuerySpec("dedup_canonical",
      SketchOracleSql.simHashCanonicalSql(maxHamming = 3, maxBucket = 1000)) { (s, d) =>
      val dd = docs(s, d)
      Dedup.canonicalByQuality(
        Dedup.simHashNearDups(dd, "text", "doc_id", maxHamming = 3, maxBucket = 1000),
        TextAnalysis.qualityScore(dd, "text").select(col("doc_id"), col("quality_score")),
        "doc_id")
    }
  )
}
