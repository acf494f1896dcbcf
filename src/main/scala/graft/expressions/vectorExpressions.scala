package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Binary FLOAT-vector -> DOUBLE scalar Catalyst expressions, the Spark
 * equivalents of the distance scalar surface the reference consumes
 * (duckdb-vss matches them by name: array_distance / array_cosine_distance /
 * array_cosine_similarity / array_negative_inner_product,
 * /root/reference/src/hnsw/hnsw_index.cpp:659-689, macros
 * hnsw_index_macros.cpp:33-40).
 *
 * Codegen delegates to the static [[VectorMath]] kernels — one static call
 * per row inside whole-stage codegen, loop JIT-compiled; no interpreter
 * fallback.
 */
abstract class BinaryVectorExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Name of the static VectorMath method implementing this kernel. */
  protected def kernel: String

  protected def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorMath.$kernel($a, $b)")
}

/** sqrt(sum (a_i-b_i)^2) — DuckDB-core `array_distance` convention. */
case class ArrayDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "l2"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.l2(a, b)
  override def prettyName: String = "array_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum (a_i-b_i)^2 — the index's internal metric (`l2sq`); monotone with ArrayDistance. */
case class ArraySquaredDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "l2Squared"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.l2Squared(a, b)
  override def prettyName: String = "array_squared_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class ArrayCosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "cosineSimilarity"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.cosineSimilarity(a, b)
  override def prettyName: String = "array_cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class ArrayCosineDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "cosineDistance"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.cosineDistance(a, b)
  override def prettyName: String = "array_cosine_distance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class ArrayInnerProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "dot"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.dot(a, b)
  override def prettyName: String = "array_inner_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class ArrayNegativeInnerProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernel: String = "negativeDot"
  override protected def compute(a: ArrayData, b: ArrayData): Double = VectorMath.negativeDot(a, b)
  override def prettyName: String = "array_negative_inner_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

// ---- Embedding storage expressions (beyond the reference surface; see
// VectorMath kernel docs for the exact cross-engine formulas).

/** array_l2_normalize(vec ARRAY<FLOAT>) -> ARRAY<FLOAT>. */
case class ArrayL2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorMath.l2Normalize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VectorMath.l2Normalize($c)")
  override def prettyName: String = "array_l2_normalize"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array_quantize_i8(vec ARRAY<FLOAT>) -> STRUCT<scale FLOAT, codes ARRAY<TINYINT>>. */
case class ArrayQuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    VectorMath.quantizeI8(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VectorMath.quantizeI8($c)")
  override def prettyName: String = "array_quantize_i8"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array_dequantize_i8(codes ARRAY<TINYINT>, scale FLOAT) -> ARRAY<FLOAT>. */
case class ArrayDequantizeI8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(ByteType), FloatType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(codes: Any, scale: Any): Any =
    VectorMath.dequantizeI8(codes.asInstanceOf[ArrayData], scale.asInstanceOf[Float])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, s) => s"graft.expressions.VectorMath.dequantizeI8($c, $s)")
  override def prettyName: String = "array_dequantize_i8"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
