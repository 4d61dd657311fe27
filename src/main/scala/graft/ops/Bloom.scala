package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftInternals.{column, expression}
import org.apache.spark.sql.catalyst.expressions.ShiftRight

/**
 * Bloom-filter pre-filtered semi-join — the runtime-filter pattern for
 * the "big probe side, medium build side" join at the 100 TB tier. A
 * shuffled semi-join moves EVERY probe row to its key's reducer; with a
 * bloom filter built from the build side first, probe rows whose key
 * cannot possibly match are dropped at the scan (a per-row bit test, no
 * shuffle), so only candidate rows pay the shuffle. The filter is a few
 * KB broadcast as a plan literal — orders of magnitude smaller than
 * broadcasting the build rows themselves.
 *
 * Correctness does not depend on the filter: a bloom filter has no
 * false negatives (every true key passes the bit test), and the exact
 * semi-join that follows removes the false positives. The output is
 * therefore exactly the plain semi-join's — which is what the DuckDB
 * oracle checks — and the hash family is free to be the cheap JVM-only
 * xxhash64.
 *
 * The driver-side `collect()` here is of bit-array WORDS (`mBits/64`
 * rows, e.g. 1024 longs for 2^16 bits), never of data rows — the sketch
 * size is fixed by `mBits`, not by the build cardinality.
 */
object Bloom {

  /** k hash-derived bit positions of a key (seeded xxhash64, mod mBits). */
  private def bitPositions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits)))

  /** (word >> n) for a column shift amount — the Scala shiftright API
    * only takes a literal Int; the Catalyst expression takes both. */
  private def shr(word: Column, n: Column): Column =
    column(ShiftRight(expression(word), expression(n)))

  /**
   * Build the filter: distributed bit-position aggregation
   * (`groupBy(word index) bit_or`), then collect the fixed-size word
   * array. `mBits` must be a positive multiple of 64.
   */
  def build(buildDf: DataFrame, keyCol: String, mBits: Int, k: Int = 4): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
    val pos = explode(array(bitPositions(col(keyCol), mBits, k): _*)).as("pos")
    val words = buildDf
      .select(pos)
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Probe predicate: all k bits set in the (plan-literal) word array. */
  def mightContain(key: Column, words: Array[Long], k: Int = 4): Column = {
    val arr = typedLit(words.toSeq)
    bitPositions(key, words.length * 64, k)
      .map { p =>
        val word = element_at(arr, shiftright(p, 6).cast("int") + 1)
        shr(word, p.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
  }

  /** Power-of-two sizing: ~16 bits per expected build key, clamped to
    * [2^10, 2^24] bits (128 B – 2 MB). */
  def sizeBits(expectedKeys: Long): Int = {
    // clamp BEFORE the multiply — ×16 on an unclamped count overflows Long
    val capped = expectedKeys.max(1L).min(1L << 20)
    val want = (capped * 16L).min(1L << 24).max(1L << 10)
    Integer.highestOneBit(want.toInt - 1) * 2
  }

  /**
   * Semi-join `probe` to `buildDf` on `keyCol`: bloom bit-test at the
   * probe scan, then the exact semi-join. `mBits` defaults to
   * [[sizeBits]] of one cheap build-side count.
   */
  def semiJoin(probe: DataFrame, buildDf: DataFrame, keyCol: String,
      mBitsOpt: Option[Int] = None, k: Int = 4): DataFrame = {
    // xxhash64 hashes by TYPE: an int probe key against a bigint build
    // key lands on different bit positions, so real matches would fail
    // the bit test — silent row loss, violating the no-false-negatives
    // guarantee before the exact semi-join could correct it. Demand the
    // caller reconcile types explicitly rather than guessing a cast.
    val pt = probe.schema(keyCol).dataType
    val bt = buildDf.schema(keyCol).dataType
    require(pt == bt,
      s"bloom semiJoin key '$keyCol' type mismatch: probe $pt vs build $bt — " +
        "xxhash64 is type-sensitive, so mismatched key types cause false " +
        "negatives; cast one side to the other's type first")
    val mBits = mBitsOpt.getOrElse(sizeBits(buildDf.count()))
    val words = build(buildDf, keyCol, mBits, k)
    probe.where(mightContain(col(keyCol), words, k))
      .join(buildDf.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}
