package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass integer field extraction from a JSON object column — the fused
 * kernel for `CAST(get_json_object(j, '$.key') AS BIGINT)`, which otherwise
 * instantiates a Jackson streaming parse per ROW per field (the dominant
 * cost of semi-structured aggregations; the reference reads JSON through
 * its own zero-allocation scanner for the same reason —
 * duckdb json extension, json_extract path).
 *
 * Semantics (matched to Spark's `TRY_CAST(get_json_object(j, '$.key') AS
 * BIGINT)` — null-safe like DuckDB's TRY_CAST; the ANSI CAST throws where
 * this returns NULL, and the two agree wherever the cast succeeds):
 *  - the FIRST top-level member named `key` wins;
 *  - an integer number value returns its long (overflow → NULL);
 *  - a string value whose content is a signed integer returns that long
 *    (the cast trims nothing here: JSON strings keep their bytes);
 *  - any other value (float, bool, object, array, null) → NULL;
 *  - missing key / malformed JSON / non-object input → NULL.
 *
 * The scanner is a real JSON tokenizer over raw UTF-8 bytes: strings skip
 * escape sequences, nested objects/arrays skip by depth counting — no
 * allocation, no char decoding (all JSON structure is ASCII; multi-byte
 * UTF-8 continuation bytes can never equal a structural byte).
 */
object JsonGet {

  /** Boxed so codegen can branch on NULL without an extra flag channel. */
  def getLong(json: UTF8String, key: UTF8String): java.lang.Long = {
    if (json == null || key == null) return null
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      i = skipWs(b, i, n)
      if (i < n && b(i) == '}') return null // end of object, key absent
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i = skipWs(b, i + 1, n)
      }
      first = false
      // member key (must be a string)
      if (i >= n || b(i) != '"') return null
      val keyStart = i + 1
      i = skipString(b, i, n)
      if (i < 0) return null
      val keyEnd = i - 1 // byte after last content byte (i is past closing quote)
      i = skipWs(b, i, n)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1, n)
      if (matches(b, keyStart, keyEnd, kb)) return parseValue(b, i, n)
      i = skipValue(b, i, n)
      if (i < 0) return null
    }
    null
  }

  private def skipWs(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  /** From an opening quote, return the index just past the closing quote
    * (or -1 when unterminated). Escapes are skipped, not decoded. */
  private def skipString(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start + 1
    while (i < n) {
      val c = b(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Raw-byte key compare. Keys containing escape sequences never match a
    * literal target — the exact-byte spelling is the lookup contract (same
    * as a columnar shredder keying on the encoded name). */
  private def matches(b: Array[Byte], s: Int, e: Int, kb: Array[Byte]): Boolean = {
    if (e - s != kb.length) return false
    var i = 0
    while (i < kb.length) {
      if (b(s + i) != kb(i)) return false
      i += 1
    }
    true
  }

  /** Value at `i` as a long, or null per the cast semantics above. */
  private def parseValue(b: Array[Byte], start: Int, n: Int): java.lang.Long = {
    var i = start
    if (i >= n) return null
    if (b(i) == '"') {
      val end = skipString(b, i, n)
      if (end < 0) return null
      return parseLong(b, i + 1, end - 1)
    }
    if (b(i) == '-' || (b(i) >= '0' && b(i) <= '9')) {
      var j = i
      if (b(j) == '-') j += 1
      val firstDigit = j
      while (j < n && b(j) >= '0' && b(j) <= '9') j += 1
      // a fraction or exponent makes it a non-integer → NULL cast
      if (j < n && (b(j) == '.' || b(j) == 'e' || b(j) == 'E')) return null
      // leading zeros are invalid JSON numbers (strict Jackson → null)
      if (j - firstDigit > 1 && b(firstDigit) == '0') return null
      return parseLong(b, i, j)
    }
    null // object / array / bool / null
  }

  /** Strict signed-decimal-integer parse of b[s, e) with overflow → null. */
  private def parseLong(b: Array[Byte], s: Int, e: Int): java.lang.Long = {
    if (s >= e) return null
    var i = s
    var neg = false
    if (b(i) == '-' || b(i) == '+') { neg = b(i) == '-'; i += 1 }
    if (i >= e) return null
    // accumulate NEGATIVE: |Long.MinValue| > |Long.MaxValue|, so the
    // negative range holds both signs' magnitudes during the loop
    var acc = 0L
    while (i < e) {
      val c = b(i)
      if (c < '0' || c > '9') return null
      val d = c - '0'
      if (acc < Long.MinValue / 10) return null
      acc = acc * 10
      if (acc < Long.MinValue + d) return null
      acc -= d
      i += 1
    }
    if (!neg && acc == Long.MinValue) return null
    java.lang.Long.valueOf(if (neg) acc else -acc)
  }

  /** Skip any JSON value starting at `i`; -1 on malformed input. */
  private def skipValue(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    if (i >= n) return -1
    b(i) match {
      case '"' => skipString(b, i, n)
      case '{' | '[' =>
        var depth = 0
        while (i < n) {
          val c = b(i)
          if (c == '"') {
            i = skipString(b, i, n)
            if (i < 0) return -1
          } else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') { depth -= 1; if (depth == 0) return i + 1 }
            i += 1
          }
        }
        -1
      case _ =>
        // number / true / false / null: run to the next structural byte
        while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
        i
    }
  }
}

/** json_get_long(json, 'key') -> BIGINT — see [[JsonGet.getLong]]. */
case class JsonGetLong(child: Expression, key: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val keyU8 = UTF8String.fromString(key)

  override def nullSafeEval(v: Any): Any = {
    val r = JsonGet.getLong(v.asInstanceOf[UTF8String], keyU8)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyU8, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.expressions.JsonGet.getLong($c, $keyRef);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })
  }

  override def prettyName: String = "json_get_long"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
