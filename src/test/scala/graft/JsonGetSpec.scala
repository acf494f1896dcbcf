package graft

import org.apache.spark.sql.functions._

import graft.functions.json_get_long

/** json_get_long must agree with
  * `TRY_CAST(get_json_object(j, '$.k') AS BIGINT)` everywhere — NULL on
  * non-integer values (under ANSI mode the plain CAST throws instead; the
  * kernel keeps the null-safe semantics, which is also what DuckDB's
  * TRY_CAST and the non-ANSI cast produce). q13's fixture holds only valid
  * integers, where CAST and TRY_CAST agree. */
class JsonGetSpec extends SparkSuite {
  import spark.implicits._

  private val cases = Seq(
    """{"k": 42, "x": "y"}""",
    """{"x": 1, "k": -7}""",
    """{"k":0}""",
    """{ "k" : 123456789012345 }""",
    """{"k": 9223372036854775807}""", // Long.MaxValue
    """{"k": -9223372036854775808}""", // Long.MinValue
    """{"k": 99999999999999999999}""", // overflow -> null
    """{"k": 1.5}""", // float -> null
    """{"k": 1e3}""", // exponent -> null
    """{"k": "12"}""", // integer-content string -> 12
    """{"k": "a12"}""", // non-numeric string -> null
    """{"k": ""}""", // empty string -> null
    """{"k": true}""", // bool -> null
    """{"k": null}""", // json null -> null
    """{"k": [1,2]}""", // array -> null
    """{"k": {"a": 1}}""", // object -> null
    """{"other": 5}""", // missing key -> null
    """{"kk": 5, "k": 6}""", // prefix key must not match
    """{"a": {"k": 9}, "k": 3}""", // nested k must not shadow top-level
    """{"a": [{"k": 9}], "k": 4}""",
    """{"a": "br{ke}n \" str", "k": 5}""", // braces/escapes inside strings
    """{"a\"b": 1, "k": 8}""", // escaped quote inside a key
    """not json""",
    """[1, 2, 3]""", // non-object
    """{"k": 00}""", // leading-zero number: invalid JSON -> null
    """{"k": "012"}""", // leading-zero STRING content: cast accepts -> 12
    """{"k": "+5"}""", // signed string content: cast accepts -> 5
    """{"k": -0}""", // negative zero: valid JSON -> 0
    """{}""",
    null
  )

  test("json_get_long matches get_json_object + BIGINT try_cast on every case") {
    val df = cases.toDF("j")
    val got = df.select(
      json_get_long(col("j"), "k").as("fast"),
      expr("try_cast(get_json_object(j, '$.k') AS BIGINT)").as("ref")).collect()
    got.zip(cases).foreach { case (r, c) =>
      val fast = if (r.isNullAt(0)) null else r.getLong(0)
      val ref = if (r.isNullAt(1)) null else r.getLong(1)
      assert(fast == ref, s"mismatch on $c: kernel=$fast builtin=$ref")
    }
  }

  test("SQL registration: json_get_long(j, 'k')") {
    cases.toDF("j").createOrReplaceTempView("jg_t")
    val rows = spark.sql(
      """SELECT json_get_long(j, 'k') AS fast,
        |       try_cast(get_json_object(j, '$.k') AS BIGINT) AS ref
        |FROM jg_t""".stripMargin).collect()
    rows.foreach { r =>
      val fast = if (r.isNullAt(0)) null else r.getLong(0)
      val ref = if (r.isNullAt(1)) null else r.getLong(1)
      assert(fast == ref, s"SQL mismatch: kernel=$fast builtin=$ref")
    }
  }
}
