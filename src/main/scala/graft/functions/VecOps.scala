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
}
