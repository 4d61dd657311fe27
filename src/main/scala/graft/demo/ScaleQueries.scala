package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._

/**
 * Round-4 export / split / quantization queries — the last-mile steps of
 * a training-data pipeline (choose the split, shuffle into shards, ship
 * int8 vectors, audit contamination). Same contract as [[OpsQueries]]:
 * every entry pairs the Spark implementation with its exact DuckDB
 * mirror; all hashes are md5-60 so both engines compute the very same
 * bits.
 */
object ScaleQueries {

  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/embeddings.parquet")

  /** DuckDB mirror of [[graft.ops.Sampling.keyHash]]. */
  private def md5h60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  private val Splits = Seq("train" -> 0.8d, "val" -> 0.1d, "test" -> 0.1d)
  private val ShardSeed = 42L
  private val NShards = 8

  val all: Seq[QuerySpec] = Seq(

    // disjoint deterministic train/val/test split: 60-bit hash bands with
    // driver-computed edges interpolated into BOTH engines as literals
    QuerySpec("text_split", {
      val edges = Sampling.splitEdges(Splits)
      val bands = edges.init
        .map { case (name, e) => s"WHEN h < $e THEN '$name'" }
        .mkString(" ")
      raw"""WITH h AS (SELECT doc_id, ${md5h60("CAST(doc_id AS VARCHAR)")} AS h FROM documents)
           |SELECT doc_id, CASE $bands ELSE '${edges.last._1}' END AS split FROM h""".stripMargin
    }) { (s, d) =>
      Sampling.hashSplit(docs(s, d), "doc_id", Splits).select(col("doc_id"), col("split"))
    },

    // balanced eval sample: exactly 20 docs per lang by key-hash order
    // (every run the same 20; tiny strata ride whole) — the
    // equal-allocation set a proportional sample can't give
    QuerySpec("text_balanced_sample",
      raw"""WITH h AS (SELECT doc_id, lang,
           |             ${md5h60("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
           |r AS (SELECT doc_id, lang,
           |        row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
           |      FROM h)
           |SELECT doc_id, lang FROM r WHERE rk <= 20""".stripMargin) { (s, d) =>
      Sampling.balancedSample(docs(s, d).select("doc_id", "lang"), "lang", "doc_id",
        n = 20)
    },

    // representativeness audit of the split: per (split, lang) cell,
    // the lang's milli share within the split vs in the whole corpus
    // and the signed bias — a hash split is uniform in expectation,
    // not by construction, and a drifted eval mix measures the wrong
    // thing. Counts one grouped aggregate; denominators broadcast
    QuerySpec("text_split_coverage", {
      val edges = Sampling.splitEdges(Splits)
      val bands = edges.init
        .map { case (name, e) => s"WHEN h < $e THEN '$name'" }
        .mkString(" ")
      raw"""WITH h AS (SELECT doc_id, lang, ${md5h60("CAST(doc_id AS VARCHAR)")} AS h
           |           FROM documents),
           |sp AS (SELECT lang, CASE $bands ELSE '${edges.last._1}' END AS split FROM h),
           |cell AS (SELECT split, lang, count(*) AS n FROM sp GROUP BY 1, 2),
           |ps AS (SELECT split, sum(n) AS ns FROM cell GROUP BY 1),
           |pt AS (SELECT lang, sum(n) AS nt FROM cell GROUP BY 1),
           |tt AS (SELECT sum(n) AS nn FROM cell)
           |SELECT cell.split, cell.lang, CAST(cell.n AS BIGINT) AS n,
           |  CAST((cell.n * 1000) // ps.ns AS BIGINT) AS share_in_split_milli,
           |  CAST((pt.nt * 1000) // tt.nn AS BIGINT) AS share_global_milli,
           |  CAST((cell.n * 1000) // ps.ns - (pt.nt * 1000) // tt.nn AS BIGINT)
           |    AS bias_milli
           |FROM cell JOIN ps USING (split) JOIN pt USING (lang) CROSS JOIN tt"""
        .stripMargin
    }) { (s, d) =>
      Sampling.splitCoverage(
        Sampling.hashSplit(docs(s, d), "doc_id", Splits), "split", "lang")
    },

    // raking / iterative proportional fitting: ONE weight column that
    // hits the language targets AND the source targets simultaneously
    // (sequential one-dim mixes undo each other). Three alternating
    // row/col scaling rounds in exact micro weights, every floor
    // mirrored; achieved marginal shares reported against the target
    // total, so unreachable targets surface as shares under 1000
    QuerySpec("text_rake_weights", {
      val langT = Seq("de", "en", "es", "fr", "zh").map(_ -> 200L)
      val srcT = (0 until 20).map(i => s"src$i" -> 50L)
      def values(t: Seq[(String, Long)]) =
        t.map { case (k, v) => s"('$k', $v)" }.mkString(", ")
      def step(i: Int, prev: String, part: String, tcol: String) =
        raw"""r$i AS (SELECT *, sum(CAST(n AS HUGEINT) * w) OVER (PARTITION BY $part) AS cur
             |        FROM $prev),
             |w$i AS (SELECT lang, source, n, tr, tc, ntot,
             |          CASE WHEN cur > 0 THEN (w * $tcol * ntot * 1000) // cur
             |               ELSE 0 END AS w
             |        FROM r$i)""".stripMargin
      val steps = (1 to 3).flatMap { r =>
        Seq(step(2 * r - 1, s"w${2 * r - 2}", "lang", "tr"),
          step(2 * r, s"w${2 * r - 1}", "source", "tc"))
      }.mkString(",\n           |")
      raw"""WITH cells AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
           |tot AS (SELECT sum(n) AS ntot FROM cells),
           |tr(lang, tr) AS (SELECT * FROM (VALUES ${values(langT)})),
           |tc(source, tc) AS (SELECT * FROM (VALUES ${values(srcT)})),
           |w0 AS (SELECT cells.lang, cells.source, cells.n, tr.tr, tc.tc, tot.ntot,
           |         CAST(1000000 AS HUGEINT) AS w
           |       FROM cells JOIN tr USING (lang) JOIN tc USING (source) CROSS JOIN tot),
           |$steps,
           |f AS (SELECT *, sum(CAST(n AS HUGEINT) * w) OVER (PARTITION BY lang) AS mr,
           |        sum(CAST(n AS HUGEINT) * w) OVER (PARTITION BY source) AS mc
           |      FROM w6)
           |SELECT lang, source, CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS weight_micro,
           |  CAST((1000 * mr) // (CAST(ntot AS HUGEINT) * 1000000) AS BIGINT) AS row_share_milli,
           |  CAST((1000 * mc) // (CAST(ntot AS HUGEINT) * 1000000) AS BIGINT) AS col_share_milli
           |FROM f""".stripMargin
    }) { (s, d) =>
      Sampling.rakeWeights(docs(s, d), "lang", "source",
        Seq("de", "en", "es", "fr", "zh").map(_ -> 200L),
        (0 until 20).map(i => s"src$i" -> 50L), rounds = 3)
    },

    // LEAKAGE-FREE split: hash-split on the near-dup COMPONENT label
    // instead of the doc id, so a train doc can never have a near-copy
    // in val/test (the classic eval-leak at corpus scale — per-doc
    // splitting puts ~half of each dup cluster on each side). Labels
    // come from the already-mirrored MinHash→components path; singleton
    // docs keep their own id. One extra label join over text_split
    QuerySpec("text_split_leakfree", {
      val edges = Sampling.splitEdges(Splits)
      val bands = edges.init
        .map { case (name, e) => s"WHEN h < $e THEN '$name'" }
        .mkString(" ")
      // k=16/bands=4 (not the 64/8 the standalone dedup_minhash queries
      // use): this oracle re-derives components in pure SQL, and at 64
      // hashes it ran ~6 min in DuckDB at sf0.01 — 2 such oracles blew the
      // driver's correctness-gate budget two rounds running. It's a value
      // check; the constants only have to MATCH across arms, and 16/4 keeps
      // the banding shape (4 rows/band) while cutting signature work 4x.
      SketchOracleSql.minHashComponentLabelsCte(
        k = 16, bands = 4, threshold = 0.5d, maxBucket = 100) +
        raw""",
             |h AS (SELECT doc_id, label, ${md5h60("CAST(label AS VARCHAR)")} AS h FROM lab)
             |SELECT doc_id, label, CASE $bands ELSE '${edges.last._1}' END AS split FROM h""".stripMargin
    }) { (s, d) =>
      val all = docs(s, d)
      val pairs = Dedup.minHashNearDups(all, "text", "doc_id",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5d, maxBucket = 100)
      val comp = Dedup.connectedComponents(pairs)
      val lab = all.select(col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("label"))
      Sampling.hashSplit(lab, "label", Splits)
        .select(col("doc_id"), col("label"), col("split"))
    },

    // END-TO-END curation pipeline — the stages a real corpus runs, in
    // order, value-checked as ONE composition (stage interaction is
    // what the per-stage checks can't see): exact-dedup survivors →
    // near-dup component labels → leakage-free hash split → seeded
    // shard/position export for the train side. val/test rows carry
    // null shard/pos — they aren't exported for training
    QuerySpec("text_curation_e2e", {
      val edges = Sampling.splitEdges(Splits)
      val bands = edges.init
        .map { case (name, e) => s"WHEN h < $e THEN '$name'" }
        .mkString(" ")
      val survCte =
        raw"""surv AS (SELECT * FROM (
             |  SELECT d.*, row_number() OVER (
             |    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
             |  FROM documents d) WHERE rn = 1),
             |""".stripMargin
      // k=8/bands=2 (one notch below text_split_leakfree's 16/4): this
      // oracle additionally re-derives exact-dedup survivors and the shard
      // export, and at 16/4 it was still the one check over the ~30 s
      // per-oracle budget (36.6 s measured); same 4 rows/band shape
      SketchOracleSql.minHashComponentLabelsCte(
        k = 8, bands = 2, threshold = 0.5d, maxBucket = 100,
        src = "surv", extraCtes = survCte) +
        raw""",
             |h AS (SELECT doc_id, ${md5h60("CAST(label AS VARCHAR)")} AS h FROM lab),
             |sp AS (SELECT doc_id, CASE $bands ELSE '${edges.last._1}' END AS split FROM h),
             |tr AS (SELECT doc_id FROM sp WHERE split = 'train'),
             |shh AS (SELECT doc_id,
             |          ${md5h60(s"'$ShardSeed:' || CAST(doc_id AS VARCHAR)")} AS hh FROM tr),
             |pos AS (SELECT doc_id, hh % $NShards AS shard,
             |          row_number() OVER (PARTITION BY hh % $NShards ORDER BY hh, doc_id) AS pos
             |        FROM shh)
             |SELECT s.doc_id, s.split, p.shard, p.pos
             |FROM sp s LEFT JOIN pos p USING (doc_id)""".stripMargin
    }) { (s, d) =>
      val surv = Dedup.exactDedup(docs(s, d), "text", "doc_id")
      val pairs = Dedup.minHashNearDups(surv, "text", "doc_id",
        shingleN = 3, k = 8, bands = 2, threshold = 0.5d, maxBucket = 100)
      val comp = Dedup.connectedComponents(pairs)
      val lab = surv.select(col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("label"))
      val split = Sampling.hashSplit(lab, "label", Splits).select(col("doc_id"), col("split"))
      val shards = Sharding.shardPositions(
        split.where(col("split") === "train"), "doc_id", NShards, ShardSeed)
      split.join(shards.select(col("doc_id"), col("shard"), col("pos")),
        Seq("doc_id"), "left")
        .select(col("doc_id"), col("split"), col("shard"), col("pos"))
    },

    // QUALITY card — the stratified companion of text_data_card's
    // composition rollup: per (lang, source), quality mass and corpus
    // share. Means and shares are divisions of EXACT integers (quality in
    // floor-rounded milli-units, the SketchQueries device), so every
    // double is one correctly-rounded op away from ints and hash-checks
    QuerySpec("text_quality_card",
      raw"""WITH f AS (
           |  SELECT doc_id, lang, source,
           |    CAST(length(text) AS DOUBLE) AS n,
           |    length(text) AS n_chars,
           |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
           |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
           |    CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS puncts,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
           |  FROM documents),
           |q AS (SELECT *, greatest(0.0, least(1.0,
           |      0.5 * (CASE WHEN n = 0 THEN 0.0 ELSE alpha / n END)
           |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
           |      + 0.2 * (1.0 - (CASE WHEN n = 0 THEN 0.0 ELSE digits / n END)
           |                   - (CASE WHEN n = 0 THEN 0.0 ELSE puncts / n END)))) AS quality_score
           |  FROM f),
           |t AS (SELECT count(*) AS total FROM documents)
           |SELECT lang, source,
           |  count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  CAST(sum(CAST(floor(1000.0 * quality_score + 0.5) AS BIGINT)) AS BIGINT) AS sum_quality_milli,
           |  CAST(sum(CAST(floor(1000.0 * quality_score + 0.5) AS BIGINT)) AS DOUBLE)
           |    / (1000.0 * CAST(count(*) AS DOUBLE)) AS mean_quality,
           |  CAST(count(*) AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE) AS doc_share
           |FROM q GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val q = TextAnalysis.qualityScore(docs(s, d), "text")
        .select(col("lang"), col("source"),
          col("n_tokens").cast("long").as("__tok"),
          length(col("text")).cast("long").as("__chars"),
          floor(lit(1000.0d) * col("quality_score") + lit(0.5d)).cast("long").as("__qm"))
      val total = docs(s, d).agg(count(lit(1)).as("__total"))
      q.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__tok")).as("total_tokens"),
          sum(col("__chars")).as("total_chars"),
          sum(col("__qm")).as("sum_quality_milli"))
        .crossJoin(broadcast(total))
        .select(col("lang"), col("source"), col("n_docs"),
          col("total_tokens"), col("total_chars"), col("sum_quality_milli"),
          (col("sum_quality_milli").cast("double")
            / (lit(1000.0d) * col("n_docs").cast("double"))).as("mean_quality"),
          (col("n_docs").cast("double") / col("__total").cast("double")).as("doc_share"))
    },

    // rendezvous (highest-random-weight) sharding: each doc lands on the
    // shard whose hash("shard:key") scores highest — the assignment that
    // survives capacity changes (see shard_rendezvous_move). Per-shard
    // population + id range, value-checked against a window-argmax mirror
    QuerySpec("shard_rendezvous",
      raw"""WITH sc AS (SELECT doc_id, s,
           |    ${md5h60("CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents CROSS JOIN (SELECT unnest(range(0, 8)) AS s) k),
           |a AS (SELECT doc_id, s,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS r
           |  FROM sc)
           |SELECT s AS shard, count(*) AS n_docs,
           |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM a WHERE r = 1 GROUP BY 1""".stripMargin) { (s, d) =>
      Sharding.rendezvousAssign(docs(s, d), "doc_id", nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    },

    // the reason rendezvous exists: growing 8 → 9 shards moves ONLY keys
    // whose argmax is the NEW shard (expected ~1/9 of the corpus; a
    // mod-hash reshard moves ~8/9). One scan computes both assignments;
    // n_moved_elsewhere pins the HRW invariant at exactly 0
    QuerySpec("shard_rendezvous_move",
      raw"""WITH s8 AS (SELECT doc_id, s,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY
           |      ${md5h60("CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} DESC,
           |      s DESC) AS r
           |  FROM documents CROSS JOIN (SELECT unnest(range(0, 8)) AS s) k),
           |s9 AS (SELECT doc_id, s,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY
           |      ${md5h60("CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} DESC,
           |      s DESC) AS r
           |  FROM documents CROSS JOIN (SELECT unnest(range(0, 9)) AS s) k),
           |j AS (SELECT a.doc_id, a.s AS sh8, b.s AS sh9
           |  FROM (SELECT doc_id, s FROM s8 WHERE r = 1) a
           |  JOIN (SELECT doc_id, s FROM s9 WHERE r = 1) b USING (doc_id))
           |SELECT count(*) AS n_total,
           |  CAST(sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           |  CAST((1000 * sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END)) // count(*)
           |    AS BIGINT) AS moved_milli,
           |  CAST(sum(CASE WHEN sh8 <> sh9 AND sh9 <> 8 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_moved_elsewhere
           |FROM j""".stripMargin) { (s, d) =>
      docs(s, d).select(
          Sharding.rendezvousShard(col("doc_id"), 8).as("sh8"),
          Sharding.rendezvousShard(col("doc_id"), 9).as("sh9"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("sh8") =!= col("sh9"), 1L).otherwise(0L)).as("n_moved"),
          expr("(1000 * sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END)) div count(*)")
            .as("moved_milli"),
          sum(when(col("sh8") =!= col("sh9") && col("sh9") =!= 8L, 1L).otherwise(0L))
            .as("n_moved_elsewhere"))
    },

    // consistent-hash ring with virtual nodes — HRW's classic sibling:
    // 16 vnodes per shard on a 60-bit md5 ring, key → first vnode
    // clockwise (wrap to the ring head). The ring is a sorted literal
    // array in the plan; assignment is a pure per-row expression. The
    // oracle rebuilds the very same ring from the same md5 math and
    // mirrors the successor pick as a window argmin
    QuerySpec("shard_ring",
      raw"""WITH vn AS (SELECT s, v,
           |    ${md5h60("'ring:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)")} AS vh
           |  FROM (SELECT unnest(range(0, 8)) AS s) a
           |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) b),
           |k AS (SELECT doc_id, ${md5h60("CAST(doc_id AS VARCHAR)")} AS kh FROM documents),
           |a AS (SELECT k.doc_id, vn.s,
           |    row_number() OVER (PARTITION BY k.doc_id
           |      ORDER BY (vn.vh < k.kh), vn.vh, vn.s) AS r
           |  FROM k CROSS JOIN vn)
           |SELECT s AS shard, count(*) AS n_docs,
           |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM a WHERE r = 1 GROUP BY 1""".stripMargin) { (s, d) =>
      Sharding.ringAssign(docs(s, d), "doc_id", nShards = 8, vnodesPerShard = 16)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    },

    // ring resharding invariant: growing 8 → 9 shards inserts ONLY the
    // new shard's 16 vnodes, so every moved key moves INTO shard 8 —
    // n_moved_elsewhere pins exactly 0, and the moved fraction is near
    // the 16/144 ≈ 111‰ vnode share (vs ~8/9 for a mod-hash reshard)
    QuerySpec("shard_ring_move",
      raw"""WITH vn AS (SELECT s, v,
           |    ${md5h60("'ring:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)")} AS vh
           |  FROM (SELECT unnest(range(0, 9)) AS s) a
           |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) b),
           |k AS (SELECT doc_id, ${md5h60("CAST(doc_id AS VARCHAR)")} AS kh FROM documents),
           |a8 AS (SELECT k.doc_id, vn.s,
           |    row_number() OVER (PARTITION BY k.doc_id
           |      ORDER BY (vn.vh < k.kh), vn.vh, vn.s) AS r
           |  FROM k CROSS JOIN vn WHERE vn.s < 8),
           |a9 AS (SELECT k.doc_id, vn.s,
           |    row_number() OVER (PARTITION BY k.doc_id
           |      ORDER BY (vn.vh < k.kh), vn.vh, vn.s) AS r
           |  FROM k CROSS JOIN vn),
           |j AS (SELECT a.doc_id, a.s AS sh8, b.s AS sh9
           |  FROM (SELECT doc_id, s FROM a8 WHERE r = 1) a
           |  JOIN (SELECT doc_id, s FROM a9 WHERE r = 1) b USING (doc_id))
           |SELECT count(*) AS n_total,
           |  CAST(sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           |  CAST((1000 * sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END)) // count(*)
           |    AS BIGINT) AS moved_milli,
           |  CAST(sum(CASE WHEN sh8 <> sh9 AND sh9 <> 8 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_moved_elsewhere
           |FROM j""".stripMargin) { (s, d) =>
      docs(s, d).select(
          Sharding.ringShard(col("doc_id"), 8, 16).as("sh8"),
          Sharding.ringShard(col("doc_id"), 9, 16).as("sh9"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("sh8") =!= col("sh9"), 1L).otherwise(0L)).as("n_moved"),
          expr("(1000 * sum(CASE WHEN sh8 <> sh9 THEN 1 ELSE 0 END)) div count(*)")
            .as("moved_milli"),
          sum(when(col("sh8") =!= col("sh9") && col("sh9") =!= 8L, 1L).otherwise(0L))
            .as("n_moved_elsewhere"))
    },

    // capacity-weighted ring: a heterogeneous fleet (counts 4/4/8/16 —
    // one big shard, one medium, two small) gets key share proportional
    // to its vnode share from the same ring machinery. The oracle builds
    // the variable-count vnode set from a VALUES capacity table and
    // mirrors the successor pick; share_milli makes the proportionality
    // visible (and value-checked) per shard
    QuerySpec("shard_ring_weighted",
      raw"""WITH cap AS (SELECT * FROM (VALUES (0, 4), (1, 4), (2, 8), (3, 16))
           |             c(s, cnt)),
           |vn AS (SELECT s, v,
           |    ${md5h60("'ring:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)")} AS vh
           |  FROM cap, unnest(range(0, cnt)) AS u(v)),
           |k AS (SELECT doc_id, ${md5h60("CAST(doc_id AS VARCHAR)")} AS kh FROM documents),
           |a AS (SELECT k.doc_id, vn.s,
           |    row_number() OVER (PARTITION BY k.doc_id
           |      ORDER BY (vn.vh < k.kh), vn.vh, vn.s) AS r
           |  FROM k CROSS JOIN vn),
           |t AS (SELECT count(*) AS n FROM documents)
           |SELECT s AS shard, CAST(cap.cnt AS BIGINT) AS n_vnodes,
           |  count(*) AS n_docs,
           |  CAST((1000 * count(*)) // t.n AS BIGINT) AS share_milli
           |FROM a JOIN cap USING (s) CROSS JOIN t
           |WHERE r = 1 GROUP BY s, cap.cnt, t.n""".stripMargin) { (s, d) =>
      val counts = Seq(4, 4, 8, 16)
      val capDf = s.createDataFrame(
        counts.zipWithIndex.map { case (c, i) => (i.toLong, c.toLong) })
        .toDF("shard", "n_vnodes")
      val total = docs(s, d).agg(count(lit(1)).as("__n"))
      docs(s, d)
        .select(Sharding.ringShardWeighted(col("doc_id"), counts).as("shard"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
        .join(broadcast(capDf), Seq("shard"))
        .crossJoin(broadcast(total))
        .select(col("shard"), col("n_vnodes"), col("n_docs"),
          expr("(1000 * n_docs) div __n").as("share_milli"))
    },

    // the third sharding discipline beside HRW and the vnode ring:
    // EXACT range sharding — boundaries are the ceil(i·n/8)-th smallest
    // order-value cents (true order statistics, not RangePartitioner's
    // run-varying reservoir sample), so assignment is monotone in the
    // key and a range scan touches contiguous shards. The oracle
    // re-derives every boundary from row_number ranks and re-assigns
    // every row; per-shard counts, lo/hi pin balance AND monotonicity
    QuerySpec("shard_range",
      raw"""WITH k AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders),
           |n AS (SELECT count(*) AS n FROM k),
           |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM k),
           |b AS (SELECT i, min(v) AS bv
           |      FROM (SELECT unnest(range(1, 8)) AS i) ii CROSS JOIN n
           |      JOIN r ON r.rk >= (i * n.n + 7) // 8
           |      GROUP BY i),
           |a AS (SELECT k.v, (SELECT count(*) FROM b WHERE b.bv <= k.v) AS shard FROM k)
           |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_rows,
           |  min(v) AS lo_cents, max(v) AS hi_cents
           |FROM a GROUP BY 1""".stripMargin) { (s, d) =>
      val ord = s.read.parquet(s"$d/orders.parquet")
        .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
      Sharding.rangeAssign(ord, "cents", nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"))
    },

    // range-reshard movement: boundaries refreshed after 10% data growth
    // (the 90% o_orderkey%10<>0 subset is "yesterday"). Quantiles barely
    // shift under uniform growth, so movers are the keys sitting between
    // the old and new cut points — moved_milli stays small and max_jump
    // pins the LOCALITY invariant (a key crosses at most the few
    // boundaries that moved past it; hash resharding scatters globally)
    QuerySpec("shard_range_move",
      raw"""WITH k AS (SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |           FROM orders),
           |ko AS (SELECT v FROM k WHERE o_orderkey % 10 <> 0),
           |no_ AS (SELECT count(*) AS n FROM ko),
           |nn_ AS (SELECT count(*) AS n FROM k),
           |ro AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM ko),
           |rn_ AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM k),
           |bo AS (SELECT i, min(v) AS bv
           |       FROM (SELECT unnest(range(1, 8)) AS i) ii CROSS JOIN no_
           |       JOIN ro ON ro.rk >= (i * no_.n + 7) // 8 GROUP BY i),
           |bn AS (SELECT i, min(v) AS bv
           |       FROM (SELECT unnest(range(1, 8)) AS i) ii CROSS JOIN nn_
           |       JOIN rn_ ON rn_.rk >= (i * nn_.n + 7) // 8 GROUP BY i),
           |a AS (SELECT k.v,
           |        (SELECT count(*) FROM bo WHERE bo.bv <= k.v) AS s_old,
           |        (SELECT count(*) FROM bn WHERE bn.bv <= k.v) AS s_new
           |      FROM k)
           |SELECT count(*) AS n_total,
           |  CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           |  CAST((1000 * sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END)) // count(*)
           |    AS BIGINT) AS moved_milli,
           |  CAST(max(abs(s_old - s_new)) AS BIGINT) AS max_jump
           |FROM a""".stripMargin) { (s, d) =>
      val ord = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val oldB = Sharding.rangeBoundaries(
        ord.where(col("o_orderkey") % 10 =!= 0), col("cents"), 8)
      val newB = Sharding.rangeBoundaries(ord, col("cents"), 8)
      ord.select(Sharding.rangeShard(col("cents"), oldB).as("s_old"),
          Sharding.rangeShard(col("cents"), newB).as("s_new"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("s_old") =!= col("s_new"), 1L).otherwise(0L)).as("n_moved"),
          expr("(1000 * sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END)) div count(*)")
            .as("moved_milli"),
          max(abs(col("s_old") - col("s_new"))).as("max_jump"))
    },

    // seeded deterministic shuffle → (shard, position): the training-order
    // export addressing, value-checked down to every row's offset
    QuerySpec("text_shards",
      raw"""WITH h AS (SELECT doc_id,
           |    ${md5h60(s"'$ShardSeed:' || CAST(doc_id AS VARCHAR)")} AS h FROM documents)
           |SELECT doc_id, h % $NShards AS shard,
           |  row_number() OVER (PARTITION BY h % $NShards ORDER BY h, doc_id) AS pos
           |FROM h""".stripMargin) { (s, d) =>
      Sharding.shardPositions(docs(s, d), "doc_id", NShards, ShardSeed)
    },

    // curriculum export: shard membership stays the unbiased seeded
    // hash, but within-shard order is quality DESC (easy/clean examples
    // first — the curriculum schedule), ties → hash, then id. Every
    // row's (shard, pos) address is value-checked
    QuerySpec("text_curriculum_shards",
      raw"""WITH f AS (
           |  SELECT doc_id,
           |    CAST(length(text) AS DOUBLE) AS n,
           |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
           |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
           |    CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) AS DOUBLE) AS puncts,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
           |  FROM documents),
           |q AS (SELECT doc_id,
           |    greatest(0.0, least(1.0,
           |      0.5 * (CASE WHEN n = 0 THEN 0.0 ELSE alpha / n END)
           |      + 0.3 * least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
           |      + 0.2 * (1.0 - (CASE WHEN n = 0 THEN 0.0 ELSE digits / n END)
           |                   - (CASE WHEN n = 0 THEN 0.0 ELSE puncts / n END)))) AS quality_score
           |  FROM f),
           |h AS (SELECT doc_id, quality_score,
           |    ${md5h60(s"'$ShardSeed:' || CAST(doc_id AS VARCHAR)")} AS h FROM q)
           |SELECT doc_id, h % $NShards AS shard, quality_score,
           |  row_number() OVER (PARTITION BY h % $NShards
           |                     ORDER BY quality_score DESC, h, doc_id) AS pos
           |FROM h""".stripMargin) { (s, d) =>
      val scored = TextAnalysis.qualityScore(docs(s, d), "text")
        .select(col("doc_id"), col("quality_score"))
      Sharding.curriculumPositions(scored, "doc_id", "quality_score", NShards, ShardSeed)
    },

    // benchmark-contamination audit: per-doc distinct word 5-grams vs a
    // benchmark slice of the corpus (every 97th doc plays the benchmark —
    // those docs hit at fraction 1.0, genuine n-gram collisions below)
    QuerySpec("text_contamination",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(
           |         CASE WHEN len(t) < 5 THEN []
           |              ELSE [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)] END)) AS g
           |       FROM tt),
           |gh AS (SELECT doc_id, ${md5h60("g")} AS gh FROM sh),
           |bh AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 97 = 0)
           |SELECT g.doc_id, count(*) AS n_grams,
           |  CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_grams,
           |  CAST(sum(CASE WHEN b.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS hit_frac
           |FROM gh g LEFT JOIN bh b USING (gh) GROUP BY 1""".stripMargin) { (s, d) =>
      val corpus = docs(s, d)
      Decontaminate.contaminationStats(corpus,
        corpus.where(col("doc_id") % 97 === 0), "text", "doc_id", n = 5)
    },

    // the REMOVAL arm of decontamination (the audit above is the stats
    // arm): surviving documents after dropping every doc sharing ≥1
    // distinct 5-gram with the benchmark slice — oracle is the same gram
    // CTE chain closed with an anti-join
    QuerySpec("text_decontaminated",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sh AS (SELECT doc_id, unnest(list_distinct(
           |         CASE WHEN len(t) < 5 THEN []
           |              ELSE [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)] END)) AS g
           |       FROM tt),
           |gh AS (SELECT doc_id, ${md5h60("g")} AS gh FROM sh),
           |bh AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 97 = 0),
           |hits AS (SELECT DISTINCT g.doc_id FROM gh g JOIN bh b USING (gh))
           |SELECT d.doc_id, d.lang, d.source FROM documents d
           |WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id)""".stripMargin) { (s, d) =>
      val corpus = docs(s, d)
      Decontaminate.decontaminate(corpus,
        corpus.where(col("doc_id") % 97 === 0), "text", "doc_id", n = 5)
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // duplicated-span profile (Lee et al. 2021 exact-substring measurement):
    // per doc, the fraction of its word 6-gram POSITIONS whose text occurs
    // ≥2 times anywhere in the corpus — spans travel as md5-60 hashes on
    // both sides, repeats kept (occurrence-weighted, unlike the distinct
    // contamination grams above)
    QuerySpec("dedup_span_stats",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sp AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) < 6 THEN []
           |              ELSE [array_to_string(t[i:i+5], ' ') FOR i IN range(1, len(t) - 4)] END) AS g
           |       FROM tt),
           |gh AS (SELECT doc_id, ${md5h60("g")} AS gh FROM sp),
           |dup AS (SELECT gh FROM gh GROUP BY gh HAVING count(*) >= 2)
           |SELECT g.doc_id, count(*) AS n_spans,
           |  CAST(sum(CASE WHEN d.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           |  CAST(sum(CASE WHEN d.gh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS dup_frac
           |FROM gh g LEFT JOIN dup d USING (gh) GROUP BY 1""".stripMargin) { (s, d) =>
      Dedup.duplicatedSpanStats(docs(s, d), "text", "doc_id", n = 6)
    },

    // the REMOVAL arm of exact-substring dedup (dedup_span_stats above is
    // the measurement arm): keep documents whose duplicated-span fraction
    // is ≤ 0.5; docs too short to have spans carry no evidence and stay
    QuerySpec("dedup_span_filtered",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sp AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) < 6 THEN []
           |              ELSE [array_to_string(t[i:i+5], ' ') FOR i IN range(1, len(t) - 4)] END) AS g
           |       FROM tt),
           |gh AS (SELECT doc_id, ${md5h60("g")} AS gh FROM sp),
           |dup AS (SELECT gh FROM gh GROUP BY gh HAVING count(*) >= 2),
           |st AS (SELECT g.doc_id, count(*) AS n_spans,
           |         sum(CASE WHEN d.gh IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
           |       FROM gh g LEFT JOIN dup d USING (gh) GROUP BY 1),
           |bad AS (SELECT doc_id FROM st
           |        WHERE CAST(n_dup AS DOUBLE) / CAST(n_spans AS DOUBLE) > 0.5)
           |SELECT d.doc_id, d.lang, d.source FROM documents d
           |WHERE NOT EXISTS (SELECT 1 FROM bad b WHERE b.doc_id = d.doc_id)""".stripMargin) {
      (s, d) =>
        Dedup.spanDedupFilter(docs(s, d), "text", "doc_id", n = 6, maxDupFrac = 0.5)
          .select(col("doc_id"), col("lang"), col("source"))
    },

    // MAXIMAL duplicated spans (variable-length exact-substring dedup):
    // runs of consecutive duplicated 6-gram positions merge into one span
    // via gaps-and-islands (pos − row_number), so a long duplicated region
    // is ONE row with its true extent — the measurement fixed n-grams
    // under-report. Every span's (start, end, gram count, token length)
    // is value-checked
    QuerySpec("dedup_substring_spans",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sp AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) < 6 THEN []
           |              ELSE [{'pos': i, 'g': array_to_string(t[i:i+5], ' ')} FOR i IN range(1, len(t) - 4)] END) AS u
           |       FROM tt),
           |gh AS (SELECT doc_id, u.pos AS pos, ${md5h60("u.g")} AS gh FROM sp),
           |dup AS (SELECT gh FROM gh GROUP BY gh HAVING count(*) >= 2),
           |dp AS (SELECT g.doc_id, g.pos FROM gh g JOIN dup d USING (gh)),
           |isl AS (SELECT doc_id, pos,
           |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |        FROM dp)
           |SELECT doc_id, min(pos) AS span_start, max(pos) + 5 AS span_end,
           |  count(*) AS n_grams, max(pos) + 5 - min(pos) + 1 AS span_tokens
           |FROM isl GROUP BY doc_id, island""".stripMargin) { (s, d) =>
      Dedup.duplicatedSpans(docs(s, d), "text", "doc_id", n = 6)
    },

    // Lee et al.'s true removal arm: CUT duplicated regions out of the
    // text, keeping the corpus-wide first occurrence — a position is
    // redundant when its 6-gram occurred earlier in (doc, pos) order;
    // redundant runs merge to maximal spans; covered tokens go. The
    // surviving string is value-checked character for character
    QuerySpec("dedup_substring_cut",
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |sp AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) < 6 THEN []
           |              ELSE [{'pos': i, 'g': array_to_string(t[i:i+5], ' ')} FOR i IN range(1, len(t) - 4)] END) AS u
           |       FROM tt),
           |gh AS (SELECT doc_id, u.pos AS pos, ${md5h60("u.g")} AS gh FROM sp),
           |occ AS (SELECT doc_id, pos,
           |          row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS r
           |        FROM gh),
           |red AS (SELECT doc_id, pos FROM occ WHERE r > 1),
           |isl AS (SELECT doc_id, pos,
           |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |        FROM red),
           |runs AS (SELECT doc_id, min(pos) AS s, max(pos) + 5 AS e
           |         FROM isl GROUP BY doc_id, island),
           |spd AS (SELECT doc_id, list({'s': s, 'e': e}) AS spans FROM runs GROUP BY doc_id),
           |tk AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) = 0 THEN []
           |              ELSE [{'tp': i, 'tok': t[i]} FOR i IN range(1, len(t) + 1)] END) AS u
           |       FROM tt),
           |kept AS (
           |  SELECT t.doc_id, t.u.tp AS tp, t.u.tok AS tok
           |  FROM tk t LEFT JOIN spd d USING (doc_id)
           |  WHERE d.spans IS NULL
           |     OR len(list_filter(d.spans, x -> t.u.tp >= x.s AND t.u.tp <= x.e)) = 0),
           |agg AS (
           |  SELECT doc_id, array_to_string(list(tok ORDER BY tp), ' ') AS text_cut,
           |    count(*) AS n_tokens_kept
           |  FROM kept GROUP BY doc_id)
           |SELECT d.doc_id, COALESCE(a.text_cut, '') AS text_cut,
           |  COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept
           |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.cutDuplicatedSpans(docs(s, d), "text", "doc_id", n = 6)
    },

    // the BPE-TOKEN arm of substring cutting: Lee et al. 2021 ran their
    // exact-substring dedup over BPE token streams (~50 tokens), not
    // whitespace words — here every word segments under a fixed 3-merge
    // BPE list (the vocab_bpe_apply device), the per-word subtokens
    // flatten in word order, and the SAME first-occurrence-survives cut
    // runs over 24-subtoken grams (≈ the 6-word window of
    // dedup_substring_cut, since these merges leave ~4 subtokens/word).
    // The surviving subtoken stream is value-checked character for
    // character
    QuerySpec("dedup_substring_cut_bpe", {
      val merges = Seq(("e", "r"), ("i", "n"), ("s", "t"))
      val base = raw"' ' || array_to_string(string_split(u.w, ''), ' ') || ' '"
      val segExpr = merges.foldLeft(base) { case (c, (a, b)) =>
        s"regexp_replace(regexp_replace($c, ' $a $b ', ' $a$b ', 'g'), ' $a $b ', ' $a$b ', 'g')"
      }
      raw"""WITH tt AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
           |                ELSE string_split_regex(trim(lower(text)), '\s+') END AS t FROM documents),
           |wrd AS (SELECT doc_id, unnest(
           |          CASE WHEN len(t) = 0 THEN []
           |               ELSE [{'wi': i, 'w': t[i]} FOR i IN range(1, len(t) + 1)] END) AS u
           |        FROM tt),
           |sg AS (SELECT doc_id, u.wi AS wi, string_split(trim($segExpr), ' ') AS subs
           |       FROM wrd),
           |sub AS (SELECT doc_id, wi, unnest(
           |          [{'si': j, 's': subs[j]} FOR j IN range(1, len(subs) + 1)]) AS v
           |        FROM sg),
           |t2 AS (SELECT doc_id, list(v.s ORDER BY wi, v.si) AS t FROM sub GROUP BY doc_id),
           |sp AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) < 24 THEN []
           |              ELSE [{'pos': i, 'g': array_to_string(t[i:i+23], ' ')} FOR i IN range(1, len(t) - 22)] END) AS u
           |       FROM t2),
           |gh AS (SELECT doc_id, u.pos AS pos, ${md5h60("u.g")} AS gh FROM sp),
           |occ AS (SELECT doc_id, pos,
           |          row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS r
           |        FROM gh),
           |red AS (SELECT doc_id, pos FROM occ WHERE r > 1),
           |isl AS (SELECT doc_id, pos,
           |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |        FROM red),
           |runs AS (SELECT doc_id, min(pos) AS s, max(pos) + 23 AS e
           |         FROM isl GROUP BY doc_id, island),
           |spd AS (SELECT doc_id, list({'s': s, 'e': e}) AS spans FROM runs GROUP BY doc_id),
           |tk AS (SELECT doc_id, unnest(
           |         CASE WHEN len(t) = 0 THEN []
           |              ELSE [{'tp': i, 'tok': t[i]} FOR i IN range(1, len(t) + 1)] END) AS u
           |       FROM t2),
           |kept AS (
           |  SELECT t.doc_id, t.u.tp AS tp, t.u.tok AS tok
           |  FROM tk t LEFT JOIN spd d USING (doc_id)
           |  WHERE d.spans IS NULL
           |     OR len(list_filter(d.spans, x -> t.u.tp >= x.s AND t.u.tp <= x.e)) = 0),
           |agg AS (
           |  SELECT doc_id, array_to_string(list(tok ORDER BY tp), ' ') AS text_cut,
           |    count(*) AS n_tokens_kept
           |  FROM kept GROUP BY doc_id)
           |SELECT d.doc_id, COALESCE(a.text_cut, '') AS text_cut,
           |  COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept
           |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
    }) { (s, d) =>
      Dedup.cutDuplicatedSpansBpe(docs(s, d), "text", "doc_id",
        merges = Seq(("e", "r"), ("i", "n"), ("s", "t")), n = 24)
    },

    // exactly-k-per-group deterministic sample (the reservoir shape, but
    // reproducible): each lang keeps its k=10 lowest-keyHash docs — hash
    // order is layout-independent, so the "reservoir" is stable across
    // runs and cluster sizes, unlike a true random reservoir
    QuerySpec("text_sample_pergroup",
      raw"""SELECT lang, doc_id FROM (
           |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
           |    ORDER BY ${md5h60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
           |  FROM documents)
           |WHERE rn <= 10""".stripMargin) { (s, d) =>
      Ranking.topKPerGroup(docs(s, d), Seq("lang"),
        Seq(Sampling.keyHash(col("doc_id")), col("doc_id")), k = 10)
        .select(col("lang"), col("doc_id"))
    },

    // uniform deterministic sample: the simplest hash-gate — keep ~25% of
    // rows by key hash, threshold a driver-computed literal in both plans
    QuerySpec("text_sample_uniform",
      raw"""SELECT doc_id, lang FROM documents
           |WHERE ${md5h60("CAST(doc_id AS VARCHAR)")} < ${Sampling.threshold(0.25)}""".stripMargin) {
      (s, d) =>
        Sampling.deterministicSample(docs(s, d), "doc_id", fraction = 0.25)
          .select(col("doc_id"), col("lang"))
    },

    // domain-mixture resampling (the DoReMi/Pile-style mixing step): the
    // largest mixture achievable without upsampling, thresholds computed
    // IN-PLAN (stratum counts → min(n/w) scale → per-stratum 60-bit
    // threshold) and mirrored CTE-for-CTE — 'es' has weight 0 and must be
    // dropped entirely
    QuerySpec("text_mixture",
      raw"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
           |w AS (SELECT lang, n,
           |        CASE lang WHEN 'de' THEN 0.2 WHEN 'en' THEN 0.5
           |                  WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.1 ELSE 0.0 END AS w
           |      FROM cnt),
           |w2 AS (SELECT * FROM w WHERE w > 0.0),
           |c AS (SELECT min(CAST(n AS DOUBLE) / w) AS c FROM w2),
           |thr AS (SELECT lang,
           |          CAST(floor(w * (SELECT c FROM c) / CAST(n AS DOUBLE)
           |            * 1152921504606846976.0) AS BIGINT) AS t
           |        FROM w2)
           |SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
           |WHERE ${md5h60("CAST(d.doc_id AS VARCHAR)")} < thr.t""".stripMargin) { (s, d) =>
      Sampling.mixtureResample(docs(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"))
    },

    // per-row weighted (importance) sample: survival probability ∝ a
    // deterministic per-row weight — here a length ramp capped at 1, so
    // short docs are downsampled and 2000+-char docs always kept; the
    // clamp + floor(w·2^60) threshold is mirrored bit-for-bit
    QuerySpec("text_sample_weighted",
      raw"""SELECT doc_id, lang FROM documents
           |WHERE ${md5h60("CAST(doc_id AS VARCHAR)")}
           |  < CAST(floor(greatest(0.0, least(CAST(n_chars AS DOUBLE) / 2000.0, 1.0))
           |      * 1152921504606846976.0) AS BIGINT)""".stripMargin) { (s, d) =>
      Sampling.weightedSample(docs(s, d), "doc_id",
        col("n_chars").cast("double") / lit(2000.0d))
        .select(col("doc_id"), col("lang"))
    },

    // context-budget crop: first 64 whitespace tokens rejoined — the
    // truncation step before packing/export, value-checked on the full
    // cropped string
    QuerySpec("text_truncate",
      raw"""SELECT doc_id,
           |  CASE WHEN length(trim(text)) = 0 THEN ''
           |       ELSE array_to_string(string_split_regex(trim(text), '\s+')[1:64], ' ')
           |  END AS text_trunc
           |FROM documents""".stripMargin) { (s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.truncateTokens(col("text"), maxTokens = 64).as("text_trunc"))
    },

    // int8-quantized exact top-k: integer dot + two per-vector scales,
    // quantization (floor(x·127/maxabs + 0.5)) and the triple-product
    // score both mirrored bit-for-bit (integer dots are exact in doubles)
    QuerySpec("sim_quant_topk",
      raw"""WITH m AS (SELECT vec_id, embedding,
           |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS ma FROM embeddings),
           |qz AS (SELECT vec_id, ma,
           |    CASE WHEN ma = 0 THEN list_transform(embedding, x -> 0.0)
           |         ELSE list_transform(embedding, x -> floor((CAST(x AS DOUBLE)*127.0)/ma + 0.5)) END AS codes
           |  FROM m),
           |q AS (SELECT vec_id AS query_id, codes AS qc, ma AS qma FROM qz WHERE vec_id % 100 = 0),
           |scored AS (SELECT query_id, z.vec_id AS neighbor_id,
           |    (list_dot_product(qc, z.codes) * (qma/127.0)) * (z.ma/127.0) AS score
           |  FROM q JOIN qz z ON z.vec_id <> query_id)
           |SELECT query_id, neighbor_id, score, rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
           |  FROM scored)
           |WHERE rank <= 5""".stripMargin) { (s, d) =>
      val e = embs(s, d)
      Similarity.quantizedTopK(e, e.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5)
    }
  )
}
