package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Scalar kernels for the vector distance functions.
 *
 * Semantics follow the reference extension's distance surface
 * (duckdb-vss, /root/reference/src/hnsw/hnsw_index.cpp:659-689 matches these
 * functions by name; the underlying math is usearch
 * index_plugins.hpp:977-1053):
 *
 *  - `l2Distance`     = sqrt(sum (a_i - b_i)^2)   (DuckDB-core `array_distance`
 *                       convention — the index may use the cheaper squared
 *                       form internally; ordering is identical)
 *  - `cosineDistance` = 1 - cos(a, b); zero-vector handling per usearch
 *                       (index_plugins.hpp:1002-1030): 0 if both sides are
 *                       zero vectors, 1 if exactly one side is zero.
 *  - `innerProduct`   = sum a_i * b_i; `negativeInnerProduct` = its negation
 *                       (DuckDB-core convention; usearch uses 1 - dot, same
 *                       ordering).
 *
 * All kernels accumulate in Double for cross-engine reproducibility and are
 * plain sequential loops (JIT auto-vectorizes); they are invoked from
 * whole-stage-generated code, so they must stay static and allocation-free.
 */
object VectorMath {

  @inline private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimensions do not match: ${n} vs ${b.numElements()}")
    }
    n
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  def l2Squared(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def negativeDot(a: ArrayData, b: ArrayData): Double = -dot(a, b)

  def cosineSimilarity(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var ab = 0.0
    var a2 = 0.0
    var b2 = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y
      a2 += x * x
      b2 += y * y
      i += 1
    }
    if (a2 == 0.0 && b2 == 0.0) 1.0
    else if (a2 == 0.0 || b2 == 0.0) 0.0
    else ab / math.sqrt(a2 * b2)
  }

  def cosineDistance(a: ArrayData, b: ArrayData): Double =
    1.0 - cosineSimilarity(a, b)

  @inline private def checkDims(a: Array[Float], b: Array[Float]): Unit =
    if (a.length != b.length) {
      throw new IllegalArgumentException(
        s"vector dimensions do not match: ${a.length} vs ${b.length}")
    }

  /** Kernels over raw float arrays (used by the HNSW index hot path). */
  def l2Squared(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def negativeDot(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < a.length) {
      s += a(i).toDouble * b(i).toDouble
      i += 1
    }
    -s
  }

  def cosineDistance(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var ab = 0.0
    var a2 = 0.0
    var b2 = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      ab += x * y
      a2 += x * x
      b2 += y * y
      i += 1
    }
    if (a2 == 0.0 && b2 == 0.0) 0.0
    else if (a2 == 0.0 || b2 == 0.0) 1.0
    else 1.0 - ab / math.sqrt(a2 * b2)
  }

  // ---- Embedding storage kernels (beyond the reference surface; the
  // preprocessing every large-scale embedding pipeline runs before
  // indexing/serving). Exact cross-engine formulas documented per kernel —
  // the oracle mirrors the operation order so doubles are bit-identical.

  /** Unit-L2 vector: x_i / sqrt(Σ x_i²), accumulated in Double, cast back
    * to Float. Zero vector normalizes to itself. */
  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    val out = new Array[Float](n)
    if (s != 0.0) {
      val norm = math.sqrt(s)
      i = 0
      while (i < n) {
        out(i) = (a.getFloat(i).toDouble / norm).toFloat
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Symmetric int8 quantization: scale = maxabs/127 (Float, for
    * dequantization); code_i = floor(x_i * 127 / maxabs + 0.5) clamped to
    * [-127, 127] — the multiply-then-divide order is the contract (the
    * oracle spells the same `CAST(x AS DOUBLE) * 127 / maxabs`, so the
    * doubles match bit-for-bit and floor can never disagree). The all-zero
    * vector quantizes to scale 0, all-zero codes. */
  def quantizeI8(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val x = math.abs(a.getFloat(i))
      // Non-finite components fail LOUDLY (the clustering quantizer's
      // contract): NaN silently skips this max (NaN > y is false) and
      // NaN.toByte = 0 below, while DuckDB's least(127, NaN) = 127 —
      // the byte-exact cross-engine contract would break with no error.
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
        throw new IllegalArgumentException(
          s"non-finite embedding component ${a.getFloat(i)} — clean or " +
            "drop the vector before quantization")
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val codes = new Array[Byte](n)
    if (maxAbs > 0.0f) {
      val m = maxAbs.toDouble
      i = 0
      while (i < n) {
        val q = math.floor(a.getFloat(i).toDouble * 127.0 / m + 0.5)
        codes(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      maxAbs / 127.0f,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)))
  }

  /** Inverse of [[quantizeI8]]: code_i * scale (Double multiply, Float
    * result) — the lossy reconstruction used at serving time. */
  def dequantizeI8(codes: ArrayData, scale: Float): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (codes.getByte(i).toDouble * scale.toDouble).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
