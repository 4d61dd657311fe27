package graft

import graft.ops.{Dedup, SetSimilarity}
import org.apache.spark.sql.functions._

class SetSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),     // near-copy of 1
    (3L, "alpha beta gamma delta epsilon zeta eta theta"),    // exact copy of 1
    (4L, "one two three four five six seven eight nine ten"),
    (5L, "totally different words in this entry right here ok")
  ).toDF("doc_id", "text")

  /** brute-force truth over collected shingle sets. */
  private def bruteForce(n: Int, tMilli: Int): Set[(Long, Long)] = {
    val sets = Dedup.shingleSets(corpus, "text", "doc_id", n)
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if uni > 0 && 1000L * inter >= tMilli.toLong * uni
    } yield (a, b)).toSet
  }

  test("jaccardPrefixJoin returns exactly the brute-force answer (no LSH misses)") {
    for (t <- Seq(500, 800, 1000)) {
      val got = SetSimilarity.jaccardPrefixJoin(corpus, "text", "doc_id", 3, t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteForce(3, t), s"mismatch at tMilli=$t")
    }
  }

  test("exact copies report jac_milli = 1000 with inter = uni") {
    val row = SetSimilarity.jaccardPrefixJoin(corpus, "text", "doc_id", 3, 800)
      .where(col("id_a") === 1 && col("id_b") === 3)
      .select("inter", "uni", "jac_milli").as[(Long, Long, Long)].collect()
    assert(row.length == 1 && row.head._1 == row.head._2 && row.head._3 == 1000L)
  }

  test("documents shorter than the shingle width never pair") {
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(SetSimilarity.jaccardPrefixJoin(tiny, "text", "doc_id", 3, 500).count() == 0)
  }

  test("MinHash banding pairs are a subset of the exact prefix-filter truth") {
    // the invariant dedup_sketch_recall reports on: candidates are
    // exact-verified, so LSH can only MISS pairs, never add them
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = SetSimilarity.jaccardPrefixJoin(docs, "text", "doc_id", 3, 800)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = graft.ops.Dedup.minHashNearDups(docs, "text", "doc_id",
        shingleN = 3, k = 16, bands = 4, threshold = 0.8d, maxBucket = 100)
      .select(col("doc1"), col("doc2")).as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH fabricated pairs: ${lsh.diff(exact)}")
  }

  test("explainPairs: exact shared counts and rarest-first evidence") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "red fox jumps over lazy dog tonight"),
      (2L, "red fox jumps over lazy cat tonight"),
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = SetSimilarity.explainPairs(corpus, "text", "doc_id", 3, pairs, k = 2)
      .as[(Long, Long, Long, String)].head()
    // shared 3-shingles of docs 1,2: "red fox jumps", "fox jumps over",
    // "jumps over lazy" -> n_shared = 3; all df=2, so evidence is the
    // 2 lexicographically-first of them, '|'-joined (registry outputs
    // stay scalar for the cross-engine hash compare)
    assert(out._3 == 3L)
    assert(out._4 == "fox jumps over|jumps over lazy")
  }

  test("containmentPrefixJoin finds full-quote inclusion that Jaccard misses") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")      // 38 3-shingles
    val quote = (10 to 19).map(i => s"w$i").mkString(" ")   // 8, all inside big
    val other = (100 to 120).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, big), (2L, quote), (3L, other)).toDF("doc_id", "text")
    val out = SetSimilarity.containmentPrefixJoin(df, "text", "doc_id", 3, 800)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1, s"expected exactly the quote pair: ${out.toSeq}")
    assert(out.head == ((1L, 2L, 8L, 8L, 1000L, 8000L / 38L)))
    // the symmetric gate at the same threshold misses it
    assert(SetSimilarity.jaccardPrefixJoin(df, "text", "doc_id", 3, 800).count() == 0L)
  }

  test("containmentPrefixJoin prefix filter loses no pair vs brute force") {
    // overlapping sliding windows over one vocabulary: dense containment
    // structure with varying overlap fractions
    val txts = (0 until 12).map { k =>
      (k.toLong, (k * 3 until k * 3 + 15).map(i => s"t$i").mkString(" "))
    }
    val df = txts.toDF("doc_id", "text")
    val fast = SetSimilarity.containmentPrefixJoin(df, "text", "doc_id", 3, 300)
      .select("id_a", "id_b", "cont_milli").as[(Long, Long, Long)].collect().toSet
    // brute force: all-pairs intersection over the same shingle table
    val sh = graft.ops.Dedup.shingleTable(df, "text", "doc_id", 3)
    val sz = sh.groupBy($"doc").agg(count(lit(1)).as("n"))
    val brute = sh.alias("a").join(sh.alias("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc" < $"b.doc")
      .groupBy($"a.doc".as("id_a"), $"b.doc".as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select($"doc".as("id_a"), $"n".as("n_a")), Seq("id_a"))
      .join(sz.select($"doc".as("id_b"), $"n".as("n_b")), Seq("id_b"))
      .where($"inter" * 1000 >= least($"n_a", $"n_b") * 300)
      .select($"id_a", $"id_b",
        expr("(inter * 1000) div least(n_a, n_b)").as("cont_milli"))
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should produce containment pairs")
    assert(fast == brute, s"prefix filter diverged: fast $fast vs brute $brute")
  }

  test("sCurveDetectMilli matches a BigInt reference and is monotone in similarity") {
    // reference: the same floor-multiply chain in exact integers
    def powMilli(x: BigInt, n: Int): BigInt =
      (1 until n).foldLeft(x)((acc, _) => acc * x / 1000)
    def ref(est: Long, r: Int, b: Int): Long =
      (BigInt(1000) - powMilli(BigInt(1000) - powMilli(BigInt(est), r), b)).toLong
    val ests = Seq(0L, 100L, 300L, 500L, 700L, 800L, 900L, 1000L)
    val configs = Seq((4, 32), (8, 16), (16, 8), (32, 4))
    val df = ests.toDF("est")
    for ((r, b) <- configs) {
      val got = df.select($"est",
          SetSimilarity.sCurveDetectMilli($"est", r, b).as("p"))
        .as[(Long, Long)].collect().toMap
      for (e <- ests) assert(got(e) == ref(e, r, b),
        s"(r=$r,b=$b,est=$e): got ${got(e)}, ref ${ref(e, r, b)}")
      // endpoints and monotonicity: the S-curve is a detection CDF
      assert(got(0L) == 0L && got(1000L) == 1000L)
      val ordered = ests.map(got)
      assert(ordered == ordered.sorted, s"not monotone for (r=$r,b=$b): $ordered")
    }
    // the SQL generator unrolls the identical chain (spot-check shape)
    val sql = SetSimilarity.sCurveDetectMilliSql("est", 2, 2)
    assert(sql == "(1000 - (((1000 - ((est * est) // 1000)) * (1000 - ((est * est) // 1000))) // 1000))")
  }

  test("weightedJaccardJoin: multiplicities decide the score, hand-computed") {
    // bags: 1 = {a:4, b:1}, 2 = {a:1, b:1}, 3 = {a:4, b:1} (copy of 1).
    // wJ(1,2) = min/max = (1+1)/(4+1) = 2/5 = 400; wJ(1,3) = 1000;
    // set Jaccard would call all three pairs identical (both tokens shared)
    val df = Seq(
      (1L, "a a a a b"), (2L, "a b"), (3L, "a a a a b")
    ).toDF("doc_id", "text")
    val out = SetSimilarity.weightedJaccardJoin(df, "text", "doc_id",
        shingleN = 1, tMilli = 300)
      .select("id_a", "id_b", "inter", "uni", "wjac_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, 5L, 400L),
      (2L, 3L, 2L, 5L, 400L),
      (1L, 3L, 5L, 5L, 1000L)))
  }

  test("weightedJaccardJoin threshold prunes with no false negatives vs brute bags") {
    val out = SetSimilarity.weightedJaccardJoin(
        Seq((1L, "a a a a b"), (2L, "a b"), (3L, "a a a a b")).toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 1, tMilli = 500)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L))) // the 400-milli pairs are gone, the copy stays
  }
}
