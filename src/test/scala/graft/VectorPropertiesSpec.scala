package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{TextHash, VectorMath}

/** Property tests for the distance and hash kernels (SURVEY §5 blueprint
  * item 4): symmetry, non-negativity, identity, the usearch zero-vector
  * cosine rules, and MinHash/SimHash invariants. */
class VectorPropertiesSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (scalatestplus bridge is not
    * in the offline cache; Test.check is the plain-scalacheck way). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.containerOfN[Array, Float](n, Gen.chooseNum(-100f, 100f)))

  private val pairGen: Gen[(Array[Float], Array[Float])] =
    vecGen.flatMap(a =>
      Gen.containerOfN[Array, Float](a.length, Gen.chooseNum(-100f, 100f)).map(b => (a, b)))

  test("l2 is symmetric, non-negative, zero on identity") {
    check(Prop.forAll(pairGen) { case (a, b) =>
      val ab = VectorMath.l2Squared(a, b)
      ab >= 0.0 && ab == VectorMath.l2Squared(b, a) && VectorMath.l2Squared(a, a) == 0.0
    })
  }

  test("cosine distance is symmetric and within [0, 2]") {
    check(Prop.forAll(pairGen) { case (a, b) =>
      val d = VectorMath.cosineDistance(a, b)
      d >= 0.0 && d <= 2.0 + 1e-12 && d == VectorMath.cosineDistance(b, a)
    })
  }

  test("zero-vector cosine rules match usearch (index_plugins.hpp:1024-1029)") {
    val z3 = Array(0f, 0f, 0f)
    assert(VectorMath.cosineDistance(z3, z3) == 0.0)
    assert(VectorMath.cosineDistance(z3, Array(1f, 2f, 3f)) == 1.0)
    assert(VectorMath.cosineDistance(Array(1f, 2f, 3f), z3) == 1.0)
  }

  test("dot is symmetric; negativeDot is its negation; kernels agree across overloads") {
    def ad(v: Array[Float]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v.map(x => x: Any))
    check(Prop.forAll(pairGen) { case (a, b) =>
      VectorMath.negativeDot(a, b) == VectorMath.negativeDot(b, a) &&
        VectorMath.negativeDot(a, b) == -VectorMath.dot(ad(a), ad(b)) &&
        VectorMath.l2Squared(a, b) == VectorMath.l2Squared(ad(a), ad(b)) &&
        VectorMath.cosineDistance(ad(a), ad(b)) == VectorMath.cosineDistance(b, a)
    })
  }

  private val tokensGen: Gen[List[String]] =
    Gen.chooseNum(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")))

  test("minHashText: permutation-invariant under duplicate shingles, deterministic") {
    check(Prop.forAll(tokensGen) { tokens =>
      val t = tokens.mkString(" ")
      val doubled = (tokens ++ tokens.takeRight(3) ++ tokens).mkString(" ")
      val s1 = TextHash.minHashText(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3, 16, 42L)
      val s2 = TextHash.minHashText(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 3, 16, 42L)
      // same text → identical signature; a superset of shingles can only
      // lower (or keep) each minimum
      val sSup = TextHash.minHashText(
        org.apache.spark.unsafe.types.UTF8String.fromString(doubled), 3, 16, 42L)
      s1.toLongArray.toSeq == s2.toLongArray.toSeq &&
        s1.toLongArray.zip(sSup.toLongArray).forall { case (x, y) => y <= x }
    })
  }

  test("simHash of identical token multisets is identical") {
    check(Prop.forAll(tokensGen) { tokens =>
      def arr(ts: List[String]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      TextHash.simHash64(arr(tokens)) == TextHash.simHash64(arr(tokens))
    })
  }
}
