package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/**
 * Static text kernels shared by interpreted eval and generated code.
 * Hashing is xxHash64 (Spark's own XXH64) — stable across JVMs and
 * partitions, no JVM-hashCode dependence, so results are reproducible on
 * any cluster layout.
 */
object TextOps {

  private final val Seed = 42L

  def hashToken(t: UTF8String): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)

  /**
   * 64-bit SimHash over a token array: per-token xxHash64 votes on each of
   * the 64 output bits; bit set iff positive majority. Near-duplicate docs
   * land within small Hamming distance (Charikar's scheme).
   */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /**
   * Document fingerprint: minimum xxHash64 over a sliding byte window of
   * width `w` (the winnowing/MinHash-of-shingles idea collapsed to one
   * value). Equal fingerprints are a cheap first-pass near-dup signal.
   * Returns 0 for texts shorter than the window.
   */
  def minWindowHash(text: UTF8String, w: Int): Long = {
    val bytes = text.getBytes
    if (bytes.length < w) return 0L
    var min = Long.MaxValue
    var i = 0
    val last = bytes.length - w
    while (i <= last) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, w, Seed)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
