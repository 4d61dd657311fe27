package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Tight-loop vector kernels shared by interpreted eval and generated code.
 * Accumulation is deliberately float32 (not double): matches the float
 * accumulation of common vector engines (and the DuckDB oracle's
 * `list_dot_product`) bit-for-bit, and halves memory traffic for the
 * 100 TB-scale scan — embeddings are float32 at rest, so a float32
 * accumulator loses nothing that the inputs had.
 */
object VecOps {

  /** Sequential float32 dot product over two float arrays. */
  def dotF(a: ArrayData, b: ArrayData): Float = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0f
    var i = 0
    while (i < n) {
      acc += a.getFloat(i) * b.getFloat(i)
      i += 1
    }
    acc
  }

  /** Sequential float32 L2 norm. */
  def normF(a: ArrayData): Float = {
    val n = a.numElements()
    var acc = 0.0f
    var i = 0
    while (i < n) {
      val v = a.getFloat(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc.toDouble).toFloat
  }

  /** Cosine similarity with float32 accumulation. 0 when either norm is 0. */
  def cosineF(a: ArrayData, b: ArrayData): Float = {
    val na = normF(a)
    val nb = normF(b)
    if (na == 0.0f || nb == 0.0f) 0.0f else dotF(a, b) / (na * nb)
  }

  /** splitmix64 finalizer: the deterministic pseudo-random source for the
    * LSH hyperplane signs — layout-independent, no RNG state, no plane
    * matrix to broadcast (public-domain mixer from Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Max absolute component of a float array (0 for an empty array) — the
    * per-vector scale of symmetric int8 quantization. */
  def maxAbsF(a: ArrayData): Float = {
    val n = a.numElements()
    var m = 0.0f
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i))
      if (v > m) m = v
      i += 1
    }
    m
  }

  /**
   * Symmetric int8 quantization: q[i] = floor(v[i] · 127 / maxabs + 0.5)
   * in DOUBLE (floor(x+0.5), not a round() whose half-even/half-up
   * convention varies across engines — this exact formula is what the
   * DuckDB oracle mirrors). |v[i]| ≤ maxabs bounds q in [-127, 127] with
   * no clamp; a zero vector quantizes to zeros. 4× smaller at rest than
   * float32 — the difference between an in-memory ANN shard and a spilled
   * one at the 100 TB tier.
   */
  def quant8F(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val ma = maxAbsF(a).toDouble
    val out = new Array[Byte](n)
    if (ma > 0.0d) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i) * 127.0d / ma + 0.5d).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact integer dot product of two int8-quantized vectors. */
  def dotQ8(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  /**
   * h-bit sign-random-projection LSH bucket: bit p is set when the dot of
   * the vector with pseudo-random ±1 hyperplane p is ≥ 0. Single pass per
   * plane, signs derived on the fly from mix64(p, i) parity — one codegen'd
   * kernel call per row instead of h interpreted higher-order-function
   * chains.
   */
  def lshBucketF(a: ArrayData, h: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < h) {
      val base = p.toLong * 0x100000001BL
      var acc = 0.0f
      var i = 0
      while (i < n) {
        val sign = if ((mix64(base + i) & 1L) == 0L) 1.0f else -1.0f
        acc += a.getFloat(i) * sign
        i += 1
      }
      if (acc >= 0.0f) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
