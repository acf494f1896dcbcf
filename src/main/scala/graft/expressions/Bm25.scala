package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
 * Framework: BM25 and Beyond") per-document scoring kernel — the lexical
 * half of a retrieval stack, complementing the vector half (§2.1's HNSW
 * family). One byte pass per document, no explode, no join: the query's
 * term strings and pinned idf values ride the task binary, exactly like
 * [[DsirKernel]]'s weight table.
 *
 *   score(d, q) = Σ_{t ∈ q} idf(t) · (tf · (k1+1)) / (tf + k1·(1−b + b·dl/avgdl))
 *
 * Cross-engine determinism contract (the gate's DuckDB oracle replays the
 * full formula in SQL): every floating-point operation after the idf
 * pinning is a correctly-rounded IEEE-754 op evaluated in the SAME order
 * on both sides, so the scores are bit-identical. The one transcendental,
 * ln, is NOT bit-portable across libm implementations — so idf is pinned
 * to integer parts-per-million at fit time (`round(ln(x)·10⁶)/10⁶`, the
 * same move as the DSIR integer-ppm weights) and only the pinned double
 * enters the score. Tokenization follows the library-wide
 * `split(text, ' ')` convention (empty tokens kept), matching DuckDB's
 * `string_split(text, ' ')`.
 */
object Bm25Kernel {

  /** tf per query term + token count, then the ordered idf-weighted sum.
    * Terms are matched by exact byte equality; the per-token cost is
    * O(|terms|), fine for query-sized term sets (the expression caps at
    * 256). Contributions are summed in TERM-INDEX order so the FP
    * addition order matches the oracle's ordered list sum. */
  def score(s: UTF8String, terms: Array[Array[Byte]], idf: Array[Double],
      k1: Double, b: Double, avgdl: Double): Double = {
    val bytes = s.getBytes
    val (starts, nTok) = TextHash.tokenBoundaries(bytes)
    val tf = new Array[Int](terms.length)
    var i = 0
    while (i < nTok) {
      val from = starts(i)
      val to = if (i + 1 == nTok) bytes.length else starts(i + 1) - 1
      val len = to - from
      var t = 0
      while (t < terms.length) {
        val term = terms(t)
        if (term.length == len) {
          var j = 0
          while (j < len && term(j) == bytes(from + j)) j += 1
          if (j == len) { tf(t) += 1; t = terms.length - 1 } // first match wins
        }
        t += 1
      }
      i += 1
    }
    val dl = nTok.toDouble
    var sum = 0.0
    var t = 0
    while (t < terms.length) {
      if (tf(t) > 0) {
        val f = tf(t).toDouble
        // Spelled EXACTLY as the oracle spells it:
        //   idf * ((tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl))))
        sum += idf(t) * ((f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * (dl / avgdl))))
      }
      t += 1
    }
    sum
  }
}

/** `bm25_score(text)` for one bound query: terms + pinned idfs + corpus
  * stats ride the task binary (see [[Bm25Kernel]]); null text → null.
  * Duplicate query terms are rejected at construction (the kernel counts
  * each token against its FIRST matching term, so a duplicate would
  * silently score zero). */
case class Bm25Score(child: org.apache.spark.sql.catalyst.expressions.Expression,
    terms: Array[String], idf: Array[Double],
    k1: Double, b: Double, avgdl: Double)
  extends UnaryExpression with ExpectsInputTypes {

  require(terms.nonEmpty && terms.length <= 256,
    s"bm25_score takes 1..256 query terms, got ${terms.length}")
  require(terms.distinct.length == terms.length,
    "bm25_score query terms must be distinct")
  require(idf.length == terms.length, "one idf per term")
  require(avgdl > 0.0, s"avgdl must be positive, got $avgdl")

  private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bm25_score"

  override def nullSafeEval(s: Any): Any =
    Bm25Kernel.score(s.asInstanceOf[UTF8String], termBytes, idf, k1, b, avgdl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("bm25Terms", termBytes, "byte[][]")
    val idfRef = ctx.addReferenceObj("bm25Idf", idf, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Bm25Kernel.score($c, $termsRef, $idfRef, $k1, $b, $avgdl)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Bm25Score =
    copy(child = newChild)
}
