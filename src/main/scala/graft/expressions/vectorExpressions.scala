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
