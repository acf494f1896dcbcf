package graft.aggregates

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/**
 * Exact decimal sum over pre-scaled integer units ("cents"), accumulated in
 * a two-long 128-bit register — the JVM answer to a native engine's int128
 * SUM (DuckDB sums DECIMAL in a hugeint accumulator).
 *
 * Why not `sum(decimal)`: Spark's decimal Sum widens the accumulator past
 * the 18-digit compact range, so every row pays a BigDecimal allocation +
 * add. Why not `sum(long)`: a 64-bit accumulator of 1e11-scale units
 * silently wraps around ~1e18 — reachable by a 100 TB fact table. Here the
 * per-row cost is three long ops (add, carry, sign-extend add), fully
 * whole-stage-codegen'd through [[DeclarativeAggregate]], and the 2^127
 * range absorbs ~1e26 of value at scale 4.
 *
 * `child` must already be the unscaled integer units as LONG (e.g.
 * `unscaled_value(cast(x as decimal(18,2)))`, or a product of such);
 * `scale` is the decimal scale of those units in the DECIMAL(38, scale)
 * result. NULL children are skipped; an empty/all-NULL group returns NULL
 * (SQL SUM semantics).
 */
case class Sum128(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(scale >= 0 && scale <= 38, "scale must be in [0, 38]")

  override def dataType: DataType = DecimalType(38, scale)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sum128 expects BIGINT units, got ${child.dataType.catalogString}")

  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(lo, hi, cnt)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  /** 128-bit two's-complement add: (aHi:aLo) + (xHi:xLo). The carry out of
    * the low word is the classic bitwise carry formula — no unsigned
    * compare needed, every op codegens to a JVM long instruction. */
  private def add128(aLo: Expression, aHi: Expression,
      xLo: Expression, xHi: Expression): (Expression, Expression) = {
    val newLo = Add(aLo, xLo)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(aLo, xLo),
        BitwiseAnd(BitwiseOr(aLo, xLo), BitwiseNot(newLo))),
      Literal(63))
    (newLo, Add(Add(aHi, xHi), carry))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val (nLo, nHi) = add128(lo, hi, x, ShiftRight(x, Literal(63)))
    Seq(nLo, nHi, Add(cnt, If(IsNull(child), Literal(0L), Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nLo, nHi) = add128(lo.left, hi.left, lo.right, hi.right)
    Seq(nLo, nHi, Add(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, DecimalType(38, scale)),
      Int128ToDecimal(hi, lo, scale))

  override def prettyName: String = "sum128"
  override protected def withNewChildInternal(c: Expression): Sum128 = copy(child = c)
}

/** (hi, lo) two's-complement 128-bit integer → DECIMAL(38, scale). Runs
  * once per GROUP (not per row), so interpreted eval is off the hot path. */
case class Int128ToDecimal(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
  override def dataType: DataType = DecimalType(38, scale)
  override def nullSafeEval(h: Any, l: Any): Any = {
    val big = java.math.BigInteger.valueOf(h.asInstanceOf[Long]).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(l.asInstanceOf[Long])))
    Decimal(new java.math.BigDecimal(big, scale), 38, scale)
  }
  override def prettyName: String = "int128_to_decimal"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
