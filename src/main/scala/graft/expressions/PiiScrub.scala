package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass byte kernels for PII scrubbing (emails, dotted-quad IPv4,
 * international phone numbers).
 *
 * The operator's SPEC is the three regexes in
 * [[graft.text.TextFunctions.EmailRe]]/Ipv4Re/PhoneRe — patterns restricted
 * to the java.util.regex ∩ RE2 common subset so the DuckDB oracle can
 * reproduce the output byte-for-byte. These kernels implement that spec
 * directly on UTF-8 bytes: for patterns of this shape (character-class
 * runs + literal separators + \b), leftmost-greedy matching reduces to
 * maximal-run scanning — no backtracking engine, no per-row Matcher
 * allocation, no UTF8String→String conversion. The email pattern is the
 * case that matters: on alphabetic text, `[A-Za-z0-9._%+-]+` makes
 * java.util.regex consume and then unwind every word at every start
 * position (the dominant cost of the naive regexp_* composition), where
 * the kernel walks each byte once. Parity with the regex composition is
 * property-tested (PipelineOpsSpec) and with RE2 by the oracle gate.
 *
 * All classes are pure ASCII; UTF-8 continuation bytes (≥ 0x80) belong to
 * none of them, and both regex engines treat non-ASCII as non-word for \b,
 * so byte-level scanning is exact.
 */
object PiiScrub {

  private val Email = "<EMAIL>".getBytes
  private val Ip = "<IP>".getBytes
  private val Phone = "<PHONE>".getBytes

  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'
  @inline private def isLocal(b: Byte): Boolean = // [A-Za-z0-9._%+-]
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean = // [A-Za-z0-9.-]
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** End of the email match starting exactly at `start` (which must open a
    * local-part run), or -1. Mirrors leftmost-greedy `L+@D+\.[A-Za-z]{2,}`:
    * the local run is maximal (any shorter split re-meets a local char, not
    * '@'), the domain takes the LARGEST '.'-split whose TLD run has ≥ 2
    * letters (greedy D+ with backtracking), the TLD run is maximal. */
  private def emailEnd(b: Array[Byte], n: Int, start: Int): Int = {
    var i = start
    while (i < n && isLocal(b(i))) i += 1
    // Starts inside the local run all re-meet the same non-'@' byte — skip
    // the run in one step (negative return = advance-by hint for the caller).
    if (i >= n || b(i) != '@') return -(i - start)
    val dStart = i + 1
    var j = dStart
    while (j < n && isDomain(b(j))) j += 1
    var k = j - 1
    while (k > dStart) {
      if (b(k) == '.') {
        var m = k + 1
        while (m < n && isAlpha(b(m))) m += 1
        if (m - (k + 1) >= 2) return m
      }
      k -= 1
    }
    // No domain split works: starts inside the local run fail on the same
    // domain; the next candidate start is the first byte AFTER the '@'
    // ("a@b@c.com" must still find "b@c.com").
    -(dStart - start)
  }

  /** End of the IPv4 match starting at `start` (a digit preceded by a
    * non-word byte), or -1. `\d{1,3}` before a literal '.' cannot backtrack
    * usefully (a shorter run re-meets a digit), so each group is a digit
    * run of exact length 1–3; the final group additionally needs \b. */
  private def ipEnd(b: Array[Byte], n: Int, start: Int): Int = {
    var p = start
    var g = 0
    while (g < 4) {
      val rs = p
      while (p < n && isDigit(b(p))) p += 1
      val rl = p - rs
      if (rl < 1 || rl > 3) return -1
      if (g < 3) {
        if (p >= n || b(p) != '.') return -1
        p += 1
      } else if (p < n && isWord(b(p))) return -1
      g += 1
    }
    p
  }

  /** End of the phone match starting at `start` (a '+'), or -1.
    * `\+\d{1,3}-\d{3}-\d{3,4}-\d{4}\b` — every group ends at a literal
    * separator or \b, so run lengths are exact. */
  private def phoneEnd(b: Array[Byte], n: Int, start: Int): Int = {
    var p = start + 1
    var rs = p
    while (p < n && isDigit(b(p))) p += 1
    if (p - rs < 1 || p - rs > 3 || p >= n || b(p) != '-') return -1
    p += 1; rs = p
    while (p < n && isDigit(b(p))) p += 1
    if (p - rs != 3 || p >= n || b(p) != '-') return -1
    p += 1; rs = p
    while (p < n && isDigit(b(p))) p += 1
    if (p - rs < 3 || p - rs > 4 || p >= n || b(p) != '-') return -1
    p += 1; rs = p
    while (p < n && isDigit(b(p))) p += 1
    if (p - rs != 4) return -1
    if (p < n && isWord(b(p))) return -1
    p
  }

  /** One find-all pass for `kind` (0=email, 1=ip, 2=phone). Returns the
    * match count; when `repl` is non-null, also writes the redacted bytes
    * into `out` (caller handles the no-match fast path). */
  private def scan(b: Array[Byte], n: Int, kind: Int, repl: Array[Byte],
      out: java.io.ByteArrayOutputStream): Int = {
    var count = 0
    var copied = 0
    var i = 0
    while (i < n) {
      var end = -1
      var next = i + 1
      val c = b(i)
      kind match {
        case 0 =>
          if (isLocal(c)) {
            val e = emailEnd(b, n, i)
            if (e >= 0) end = e else next = i - e // advance hint (≥ i+1)
          }
        case 1 =>
          if (isDigit(c) && (i == 0 || !isWord(b(i - 1)))) end = ipEnd(b, n, i)
        case _ =>
          if (c == '+') end = phoneEnd(b, n, i)
      }
      if (end >= 0) {
        count += 1
        if (out != null) {
          out.write(b, copied, i - copied)
          out.write(repl, 0, repl.length)
          copied = end
        }
        i = end
      } else i = next
    }
    if (out != null && count > 0) out.write(b, copied, n - copied)
    count
  }

  private def pass(b: Array[Byte], kind: Int, repl: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length + 16)
    if (scan(b, b.length, kind, repl, out) == 0) b else out.toByteArray
  }

  /** redact_pii(text): email → phone → IPv4 passes (same order as the
    * regexp_replace composition the oracle runs). */
  def redact(s: UTF8String): UTF8String = {
    val b0 = s.getBytes
    val b3 = pass(pass(pass(b0, 0, Email), 2, Phone), 1, Ip)
    if (b3 eq b0) s else UTF8String.fromBytes(b3)
  }

  /** pii_stats(text): per-category counts over the ORIGINAL text. */
  def stats(s: UTF8String): GenericInternalRow = {
    val b = s.getBytes
    new GenericInternalRow(Array[Any](
      scan(b, b.length, 0, null, null).toLong,
      scan(b, b.length, 1, null, null).toLong,
      scan(b, b.length, 2, null, null).toLong))
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false)))
}

/** redact_pii(text) -> STRING — see [[PiiScrub.redact]]. */
case class RedactPii(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    PiiScrub.redact(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PiiScrub.redact($c)")
  override def prettyName: String = "redact_pii"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pii_stats(text) -> STRUCT<n_emails, n_ips, n_phones> — see
  * [[PiiScrub.stats]]. */
case class PiiStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = PiiScrub.statsSchema
  override def nullSafeEval(v: Any): Any =
    PiiScrub.stats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PiiScrub.stats($c)")
  override def prettyName: String = "pii_stats"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
