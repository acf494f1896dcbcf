package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic text-hashing kernels for the LLM-pipeline operators
 * (dedup, fingerprinting). All algorithms are standard public constructions:
 * FNV-1a 64, the splitmix64 finalizer, MinHash (Broder 1997), SimHash
 * (Charikar 2002), and a polynomial rolling hash.
 *
 * Like [[VectorMath]], kernels are static and allocation-light so the
 * expressions below can call them from whole-stage-generated code.
 */
object TextHash {

  final val Fnv64Offset = 0xcbf29ce484222325L
  final val Fnv64Prime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Fnv64Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Fnv64Prime
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent re-mix of one hash. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /**
   * MinHash signature: k minima of independently re-mixed shingle hashes.
   * One base hash per shingle, k cheap mixes — O(|shingles| * k).
   */
  def minHashSignature(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = fnv1a64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = mix64(h ^ mix64(seed + j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /**
   * Fused tokenize → word-n-gram-shingle → MinHash kernel: one pass over
   * the UTF-8 bytes, no shingle strings materialized. Shingle identity is
   * the mix of the n token FNV hashes (equivalent power to hashing the
   * joined string; duplicates can't affect a min). Returns an empty array
   * when there are fewer than n tokens.
   */
  def minHashText(s: UTF8String, n: Int, k: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    // 1. token FNV hashes (split on single spaces, like split(text, ' '))
    var tokenHashes = new Array[Long](math.max(8, bytes.length / 5))
    var nTokens = 0
    var h = Fnv64Offset
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (nTokens == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTokens * 2)
        }
        tokenHashes(nTokens) = h
        nTokens += 1
        h = Fnv64Offset
      } else {
        h ^= (bytes(i) & 0xffL)
        h *= Fnv64Prime
      }
      i += 1
    }
    if (nTokens < n) return new GenericArrayData(Array.empty[Long])
    // 2. sliding window shingle hash + k-min signature
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = mix64(seed + j); j += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    var w = 0
    while (w <= nTokens - n) {
      var sh = 0L
      var t = 0
      while (t < n) { sh = mix64(sh ^ tokenHashes(w + t)); t += 1 }
      j = 0
      while (j < k) {
        val v = mix64(sh ^ seeds(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array (term-frequency weighted). */
  def simHash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling hash (base 1000003, mod 2^64) of the whole string —
    * the document-fingerprint primitive. */
  def rollingFingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  final val ClassAlpha = 0
  final val ClassNonAlnumSpace = 1
  final val ClassSpace = 2

  /**
   * Single-pass ASCII character-class counter over UTF-8 bytes — the
   * text-quality kernels without java.util.regex. Exactly equals the regex
   * formulations the oracle uses (the classes are pure-ASCII, so every
   * non-ASCII code point is "not in class"; a code point's leading byte
   * stands for the whole char, continuation bytes are skipped):
   *
   *   ClassAlpha         = length(regexp_replace(s, "[^a-z]", "")): bytes
   *                        'a'..'z' (never part of a multi-byte char)
   *   ClassNonAlnumSpace = length(regexp_replace(s, "[a-z0-9 ]", "")):
   *                        char-start bytes not a-z / 0-9 / space
   *   ClassSpace         = count of ' ' (0x20)
   *
   * java.util.regex with per-row replaced-string allocation runs at tens of
   * MB/s; this loop runs at memory bandwidth — the difference is the whole
   * cost of the corpus quality filter at scale.
   */
  def asciiClassCount(s: UTF8String, mode: Int): Int = {
    val n = s.numBytes
    var cnt = 0
    var i = 0
    mode match {
      case ClassAlpha =>
        while (i < n) {
          val b = s.getByte(i)
          if (b >= 'a' && b <= 'z') cnt += 1
          i += 1
        }
      case ClassNonAlnumSpace =>
        while (i < n) {
          val b = s.getByte(i)
          // count char-start bytes (ASCII or UTF-8 leading) outside the class
          if ((b & 0xC0) != 0x80 && !(b >= 'a' && b <= 'z') &&
            !(b >= '0' && b <= '9') && b != ' ') cnt += 1
          i += 1
        }
      case _ =>
        while (i < n) {
          if (s.getByte(i) == ' ') cnt += 1
          i += 1
        }
    }
    cnt
  }
}

/** minhash_signature(shingles ARRAY<STRING>, k, seed) -> ARRAY<BIGINT>. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "minhash k must be positive")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.minHashSignature(v.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.minHashSignature($c, $k, ${seed}L)")
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_text(text STRING, n, k, seed) -> ARRAY<BIGINT>: fused
  * shingle+MinHash (no intermediate shingle array). */
case class MinHashText(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && k > 0, "shingle n and minhash k must be positive")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.minHashText(v.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.minHashText($c, $n, $k, ${seed}L)")
  override def prettyName: String = "minhash_text"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(tokens ARRAY<STRING>) -> BIGINT. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextHash.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.simHash64($c)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** fingerprint64(text STRING) -> BIGINT (rolling hash). */
case class Fingerprint64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.rollingFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.rollingFingerprint($c)")
  override def prettyName: String = "fingerprint64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ascii_class_count(text, mode) -> INT — see [[TextHash.asciiClassCount]]. */
case class AsciiClassCount(child: Expression, mode: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextHash.asciiClassCount(v.asInstanceOf[UTF8String], mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHash.asciiClassCount($c, $mode)")
  override def prettyName: String = "ascii_class_count"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
