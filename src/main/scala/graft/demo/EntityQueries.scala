package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QuerySpec

/**
 * Round-10 entity-resolution and event-history queries: fuzzy identifier
 * matching, slowly-changing-dimension intervals, and behavior-transition
 * statistics. Same contract as [[OpsQueries]]: every entry pairs the
 * Spark implementation with its exact DuckDB mirror — all arithmetic is
 * integer/decimal-exact so both engines compute identical bits.
 */
object EntityQueries {

  private def customer(s: SparkSession, d: String) =
    s.read.parquet(s"$d/customer.parquet")
  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")
  private def events(s: SparkSession, d: String) = OpsQueries.events(s, d)

  val all: Seq[QuerySpec] = Seq(

    // fuzzy entity matching at join scale: every customer-name pair
    // within edit distance 1, found by deletion-neighborhood blocking
    // (ops/Fuzzy.scala) instead of an O(n²) cartesian levenshtein scan.
    // TPC-H names are zero-padded digit strings, so single-digit
    // substitutions give a dense planted answer set. The oracle mirrors
    // the same blocking scheme — a cross-join levenshtein filter would
    // take DuckDB quadratic time too
    QuerySpec("recon_fuzzy_names",
      raw"""WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer),
           |v AS (SELECT id, s, unnest(list_append(
           |        [substr(s, 1, i-1) || substr(s, i+1, length(s))
           |         FOR i IN range(1, length(s)+1)], s)) AS v
           |      FROM c),
           |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |                a.s AS s_a, b.s AS s_b
           |         FROM v a JOIN v b ON a.v = b.v AND a.id < b.id)
           |SELECT id_a, id_b, s_a, s_b,
           |  CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
           |FROM cand WHERE levenshtein(s_a, s_b) <= 1""".stripMargin) { (s, d) =>
      graft.ops.Fuzzy.pairsWithin1(customer(s, d), "c_name", "c_custkey")
    },

    // SCD-2 dimension build from the raw event log: consecutive
    // same-type events per user collapse into half-open validity
    // intervals (gaps-and-islands over a per-user window; ops/History).
    // valid_to of the last run is NULL — the entity's current state
    QuerySpec("events_scd2",
      raw"""WITH o AS (SELECT user_id, event_type, ts, event_id,
           |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           |      FROM events),
           |m AS (SELECT user_id, event_type, ts,
           |        CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
           |          OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
           |      FROM o),
           |g AS (SELECT user_id, version, min(event_type) AS state,
           |        min(ts) AS valid_from, count(*) AS n_events
           |      FROM m GROUP BY 1, 2)
           |SELECT user_id, state, valid_from,
           |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
           |  n_events, version
           |FROM g""".stripMargin) { (s, d) =>
      graft.ops.History.scd2(events(s, d), "user_id", "event_type", "ts", "event_id")
    },

    // row-normalized Markov transition matrix of user behavior, exact to
    // the milli-unit: integer `div`, never float division, so both
    // engines emit identical probabilities. The normalizing window is
    // bounded by the event-type alphabet
    QuerySpec("events_transitions",
      raw"""WITH o AS (SELECT event_type AS to_type,
           |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
           |      FROM events),
           |c AS (SELECT from_type, to_type, count(*) AS n
           |      FROM o WHERE from_type IS NOT NULL GROUP BY 1, 2)
           |SELECT from_type, to_type, n,
           |  CAST((n * 1000) // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
           |       AS BIGINT) AS p_milli
           |FROM c""".stripMargin) { (s, d) =>
      graft.ops.History.transitionCounts(events(s, d), "user_id", "event_type", "ts", "event_id")
    },

    // EXACT Jaccard near-dup pairs (no MinHash false negatives) via
    // prefix filtering over 3-shingle sets at t = 0.8: sets order by
    // ascending corpus frequency, only the short rarest-first prefixes
    // join, and one exact intersection count per candidate settles the
    // pair. Measured at sf0.01: 25 candidates → 25 true pairs — the
    // filter passes essentially nothing it shouldn't (ops/SetSimilarity)
    QuerySpec("dedup_jaccard_prefix",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |              ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sh AS (SELECT DISTINCT doc_id AS doc, unnest(CASE WHEN len(t) < 3 THEN []
           |         ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)] END) AS tok
           |       FROM tt),
           |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
           |df AS (SELECT tok, count(*) AS df FROM sh GROUP BY 1),
           |rk AS (SELECT s.doc, s.tok,
           |         row_number() OVER (PARTITION BY s.doc ORDER BY d.df, s.tok) AS r, z.n
           |       FROM sh s JOIN df d USING (tok) JOIN sz z USING (doc)),
           |pf AS (SELECT doc, tok FROM rk WHERE r <= n - ((800 * n + 999) // 1000) + 1),
           |cand AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
           |         FROM pf a JOIN pf b ON a.tok = b.tok AND a.doc < b.doc),
           |i AS (SELECT c.id_a, c.id_b, count(*) AS inter
           |      FROM cand c JOIN sh sa ON sa.doc = c.id_a
           |                  JOIN sh sb ON sb.doc = c.id_b AND sb.tok = sa.tok
           |      GROUP BY 1, 2)
           |SELECT i.id_a, i.id_b, i.inter, za.n + zb.n - i.inter AS uni,
           |  CAST((i.inter * 1000) // (za.n + zb.n - i.inter) AS BIGINT) AS jac_milli
           |FROM i JOIN sz za ON za.doc = i.id_a JOIN sz zb ON zb.doc = i.id_b
           |WHERE i.inter * 1000 >= (za.n + zb.n - i.inter) * 800""".stripMargin) { (s, d) =>
      graft.ops.SetSimilarity.jaccardPrefixJoin(docs(s, d), "text", "doc_id",
        shingleN = 3, tMilli = 800)
    },

    // JSON-Lines round-trip (the recon_csv_roundtrip twin for the LLM
    // interchange format): documents → jsonl files → read back with the
    // WRITER's schema (no inference pass), value-identical to the source
    // table. Eager cut before the temp files are deleted
    QuerySpec("text_jsonl_roundtrip",
      "SELECT doc_id, text, lang, source, n_chars FROM documents") { (s, d) =>
      val src = docs(s, d).select("doc_id", "text", "lang", "source", "n_chars")
      val tmp = CurationQueries.runTmpDir(s, "graft_jsonl_roundtrip")
      graft.recon.Sinks.writeJsonl(src, tmp.getAbsolutePath)
      val back = graft.recon.Sources.readJsonl(s, tmp.getAbsolutePath, src.schema)
      // EAGER: the frame's input files are deleted on the next line
      val out = graft.recon.Checkpoints.cut(back, eager = true)
      CurationQueries.deleteRecursively(tmp)
      out
    },

    // content-defined chunk duplication (the storage-dedup angle the
    // fixed n-gram spans miss): rolling-hash boundaries (w=4 grams,
    // divisor 8 → ~8-token chunks) re-align after an insertion, so a doc
    // that copies a region with an extra word up front still shares every
    // chunk past the first boundary. Per doc: chunks, corpus-duplicated
    // chunks, exact milli-fraction
    QuerySpec("dedup_cdc_chunks", {
      def h60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |              ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |tk AS (SELECT doc_id AS doc, unnest(CASE WHEN len(t) = 0 THEN []
           |         ELSE [{'tp': i, 'tok': t[i]} FOR i IN range(1, len(t) + 1)] END) AS u FROM tt),
           |tok AS (SELECT doc, u.tp AS tp, u.tok AS tok FROM tk),
           |gr AS (SELECT doc_id AS doc, unnest(CASE WHEN len(t) < 4 THEN []
           |         ELSE [{'tp': i, 'g': array_to_string(t[i:i+3], ' ')}
           |               FOR i IN range(1, len(t) - 2)] END) AS u FROM tt),
           |bd AS (SELECT doc, u.tp AS tp, (${h60("u.g")} % 8 = 0) AS cut FROM gr),
           |mk AS (SELECT tok.doc, tok.tp, tok.tok,
           |         CASE WHEN tok.tp = 1 OR COALESCE(bd.cut, false) THEN tok.tp END AS bnd
           |       FROM tok LEFT JOIN bd ON bd.doc = tok.doc AND bd.tp = tok.tp),
           |asg AS (SELECT doc, tp, tok,
           |          max(bnd) OVER (PARTITION BY doc ORDER BY tp ROWS UNBOUNDED PRECEDING) AS chunk_start
           |        FROM mk),
           |ch AS (SELECT doc, chunk_start,
           |         ${h60("array_to_string(list(tok ORDER BY tp), ' ')")} AS chunk_hash
           |       FROM asg GROUP BY 1, 2),
           |fq AS (SELECT chunk_hash, count(*) AS n FROM ch GROUP BY 1)
           |SELECT ch.doc AS doc_id, count(*) AS n_chunks,
           |  CAST(sum(CASE WHEN fq.n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           |  CAST((sum(CASE WHEN fq.n >= 2 THEN 1 ELSE 0 END) * 1000) // count(*) AS BIGINT) AS dup_milli
           |FROM ch JOIN fq USING (chunk_hash) GROUP BY 1""".stripMargin
    }) { (s, d) =>
      graft.ops.Dedup.cdcChunkStats(docs(s, d), "text", "doc_id", w = 4, divisor = 8)
    },

    // stream-stream join, batch twin: click→purchase attribution pairs
    // within a 1 h band. The streaming form
    // (EventPipeline.attributionStream) carries the SAME equi+interval
    // condition — the interval is what lets Spark evict join state once
    // the opposite watermark passes; a spec pins the two forms equal
    QuerySpec("stream_attribution",
      raw"""WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
           |c AS (SELECT user_id, event_id AS click_id, ms AS click_ms
           |      FROM e WHERE event_type = 'click'),
           |p AS (SELECT user_id, event_id AS purchase_id, ms AS purchase_ms
           |      FROM e WHERE event_type = 'purchase')
           |SELECT c.user_id, c.click_id, p.purchase_id, c.click_ms, p.purchase_ms
           |FROM c JOIN p ON c.user_id = p.user_id
           |  AND p.purchase_ms >= c.click_ms
           |  AND p.purchase_ms <= c.click_ms + 3600000""".stripMargin) { (s, d) =>
      graft.streaming.EventPipeline.attribution(events(s, d), windowMs = 3600000L)
    },

    // k-anonymity with a generalization ladder over the TPC-H geography
    // hierarchy: release nation when the (nation, segment) class has
    // >= 12 members, else region when the generalized class does, else
    // suppress. The hierarchy lookup is a broadcast dim join; both class
    // counts are plain windows on quasi tuples (ops/Privacy.scala)
    QuerySpec("privacy_k_anon",
      raw"""WITH c AS (SELECT c_custkey, n.n_name AS geo, r.r_name AS parent,
           |             c_mktsegment AS cat
           |           FROM customer JOIN nation n ON c_nationkey = n_nationkey
           |                         JOIN region r ON n.n_regionkey = r_regionkey),
           |s1 AS (SELECT *, count(*) OVER (PARTITION BY geo, cat) AS n1 FROM c),
           |s2 AS (SELECT *, count(CASE WHEN n1 < 12 THEN 1 END)
           |         OVER (PARTITION BY parent, cat) AS n2 FROM s1)
           |SELECT c_custkey,
           |  CASE WHEN n1 >= 12 THEN geo WHEN n2 >= 12 THEN parent END AS quasi_geo,
           |  CASE WHEN n1 >= 12 OR n2 >= 12 THEN cat END AS quasi_cat,
           |  CAST(CASE WHEN n1 >= 12 THEN 0 WHEN n2 >= 12 THEN 1 ELSE 2 END AS BIGINT) AS anon_level,
           |  CAST(CASE WHEN n1 >= 12 THEN n1 WHEN n2 >= 12 THEN n2 END AS BIGINT) AS group_n
           |FROM s2""".stripMargin) { (s, d) =>
      val n = broadcast(s.read.parquet(s"$d/nation.parquet"))
      val r = broadcast(s.read.parquet(s"$d/region.parquet"))
      val c = customer(s, d)
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name").as("geo"),
          col("r_name").as("parent"), col("c_mktsegment").as("cat"))
      graft.ops.Privacy.kAnonymize(c, "c_custkey", "geo", "parent", "cat", k = 12)
    })
}
