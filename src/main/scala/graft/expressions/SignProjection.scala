package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Sign-random-projection (hyperplane) LSH kernel for embedding near-dup
 * detection (Charikar 2002): bit p of the result is the sign of the dot
 * product with a pseudo-random hyperplane derived deterministically from
 * (seed, p, dimension index) via splitmix64 — no stored plane matrix, so the
 * same (seed, planes) always buckets identically on any executor.
 */
object SignProjectionKernel {

  /** Uniform in [-1, 1) from a mixed counter. */
  @inline private def unit(x: Long): Double =
    (TextHash.mix64(x) >>> 11).toDouble / (1L << 52).toDouble - 1.0

  def project(vec: ArrayData, planes: Int, seed: Long): Long = {
    val n = vec.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      val planeSeed = seed + p.toLong * 0x9e3779b9L
      while (i < n) {
        dot += vec.getFloat(i).toDouble * unit(planeSeed + i)
        i += 1
      }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

/** sign_projection(vec ARRAY<FLOAT>) -> BIGINT bitmask of `planes` signs. */
case class SignRandomProjection(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes > 0 && planes <= 64, "planes must be in 1..64")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SignProjectionKernel.project(v.asInstanceOf[ArrayData], planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SignProjectionKernel.project($c, $planes, ${seed}L)")
  override def prettyName: String = "sign_projection"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
