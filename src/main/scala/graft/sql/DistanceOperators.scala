package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualNullSafe, Expression, LeafExpression, Subtract, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

import graft.expressions.{ArrayCosineDistance, ArrayDistance, ArrayNegativeInnerProduct}

/**
 * The reference's distance-operator spellings
 * (/root/reference/src/hnsw/hnsw_index.cpp:663-669):
 *
 *   a <-> b   = array_distance(a, b)                (L2)
 *   a <=> b   = array_cosine_distance(a, b)
 *   a <#> b   = array_negative_inner_product(a, b)
 *
 * Spark's parser has no custom-operator hook, so two different devices
 * cover the three spellings:
 *
 *  - `<->` / `<#>` are not Spark operators at all — any occurrence outside
 *    a string literal, quoted identifier, or comment is ours. A
 *    literal-aware textual pre-pass ([[rewrite]], called by
 *    [[GraftSqlParser]] before delegating) turns `a <-> b` into
 *    `a - _graft_op_l2() - b`: the marker function resolves to
 *    [[GraftOpMarker]] and the left-associative parse
 *    `Subtract(Subtract(a, marker), b)` is unambiguously recoverable by
 *    the resolution rule below. No operand extraction, no expression
 *    grammar: Spark's own parser does the bracketing. Consequence: the
 *    operators bind at ADDITIVE precedence (tighter than comparisons, so
 *    `a <-> b < 0.5` means `(a <-> b) < 0.5` like the reference, but
 *    level with +/- — parenthesize un-parenthesized arithmetic operands).
 *  - `<=>` already parses as Spark's null-safe equality. The rule
 *    reinterprets EqualNullSafe ONLY when both resolved operands are
 *    FLOAT arrays — the vector type the reference operator is defined
 *    over; every other type keeps Spark's null-safe-equal semantics.
 *    Null-safe equality OF float vectors is the one surface this shadows,
 *    and the shadow covers BOTH spellings of that surface: SQL `a <=> b`
 *    and the DataFrame API's `Column.eqNullSafe` / `df("v") <=> df("w")`
 *    (the rule sees the analyzed plan, which carries no SQL-vs-API
 *    provenance — a float-vector EqualNullSafe in a select, filter, or
 *    JOIN CONDITION becomes a double-typed cosine distance either way).
 *    `spark.graft.sql.cosineOperator=false` restores native semantics on
 *    both; boolean contexts fail analysis loudly (a DOUBLE where a
 *    predicate is required) rather than silently changing results.
 */
object DistanceOperators {

  private[graft] val CosineOperatorKey = "spark.graft.sql.cosineOperator"

  /** Marker planted by the textual pre-pass; only ever consumed by
    * [[DistanceOperatorResolution]]. BinaryType on purpose: unlike
    * NullType it implicit-casts to nothing, so type coercion leaves the
    * surrounding Subtract unresolved (instead of wrapping the marker)
    * until the rule fires. */
  case class GraftOpMarker(kind: String) extends LeafExpression with Unevaluable {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = s"_graft_op_$kind"
  }

  private val markers = Map("l2" -> "_graft_op_l2", "negip" -> "_graft_op_negip")

  /** Marker-function registrations for GraftExtensions.injectFunction —
    * must exist in the registry or ResolveFunctions throws before the
    * resolution rule can consume the surrounding Subtract pair. */
  private[graft] def markerBuilders: Seq[(String, Seq[Expression] => Expression)] =
    markers.map { case (kind, name) =>
      name -> ((args: Seq[Expression]) => {
        require(args.isEmpty, s"$name takes no arguments")
        GraftOpMarker(kind)
      })
    }.toSeq

  /** Textual pre-pass: replace `<->`/`<#>` with the additive marker
    * spelling everywhere outside 'strings', "strings", `quoted
    * identifiers`, -- line comments and bracketed comments. Cheap no-op
    * (reference-equality return) when neither token occurs. */
  def rewrite(sql: String): String = {
    if (!sql.contains("<->") && !sql.contains("<#>")) return sql
    val out = new StringBuilder(sql.length + 32)
    var i = 0
    val n = sql.length
    var quote: Char = 0 // 0 = code; otherwise the active quote/comment kind
    while (i < n) {
      val c = sql.charAt(i)
      quote match {
        case 0 =>
          if (sql.startsWith("<->", i)) { out.append(" - _graft_op_l2() - "); i += 3 }
          else if (sql.startsWith("<#>", i)) { out.append(" - _graft_op_negip() - "); i += 3 }
          else {
            if (c == '\'' || c == '"' || c == '`') quote = c
            else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') quote = 'L'
            else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') quote = 'B'
            out.append(c); i += 1
          }
        case 'L' => // line comment
          if (c == '\n') quote = 0
          out.append(c); i += 1
        case 'B' => // bracketed comment
          if (c == '*' && i + 1 < n && sql.charAt(i + 1) == '/') { out.append("*/"); i += 2; quote = 0 }
          else { out.append(c); i += 1 }
        case q => // inside a quote; a doubled quote re-enters immediately, same effect
          if (c == '\\' && i + 1 < n) { out.append(c).append(sql.charAt(i + 1)); i += 2 }
          else { if (c == q) quote = 0; out.append(c); i += 1 }
      }
    }
    out.toString
  }

  private def isFloatVec(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  })

  /** Strip casts type coercion may have wrapped around the marker before
    * this rule ran. */
  private object Marker {
    def unapply(e: Expression): Option[String] = e match {
      case GraftOpMarker(k) => Some(k)
      case Cast(GraftOpMarker(k), _, _, _) => Some(k)
      case _ => None
    }
  }

  class DistanceOperatorResolution(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val cosine = spark.conf.get(CosineOperatorKey, "true").equalsIgnoreCase("true")
      plan.resolveOperatorsUp { case p =>
        p.transformExpressionsUp {
          case Subtract(Subtract(l, Marker(kind), _), r, _) => kind match {
            case "l2" => ArrayDistance(l, r)
            case "negip" => ArrayNegativeInnerProduct(l, r)
          }
          case EqualNullSafe(l, r) if cosine && isFloatVec(l) && isFloatVec(r) =>
            ArrayCosineDistance(l, r)
        }
      }
    }
  }
}
