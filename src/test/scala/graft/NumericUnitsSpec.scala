package graft

import org.apache.spark.sql.functions._

import graft.functions.{decimal_units, double_units}

/** double_units ≡ decimal_units on its documented domain: DOUBLEs holding
  * exact ≤scale-digit decimal values. */
class NumericUnitsSpec extends SparkSuite {
  import spark.implicits._

  test("double_units matches the decimal cast on 2- and 4-decimal doubles") {
    val rnd = new scala.util.Random(7)
    // values like the money columns: cents in [-1e9, 1e9] rendered as doubles
    val cents = (1 to 20000).map(_ => rnd.nextLong() % 1000000000L)
    val df = cents.map(c => (c / 100.0, c / 10000.0)).toDF("d2", "d4")
    val bad = df.select(
        double_units($"d2", 2).as("f2"), decimal_units($"d2", 18, 2).as("s2"),
        double_units($"d4", 4).as("f4"), decimal_units($"d4", 18, 4).as("s4"))
      .where($"f2" =!= $"s2" || $"f4" =!= $"s4")
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("double_units: nulls propagate, non-double input rejected") {
    val df = Seq(Some(12.34), None).toDF("x")
    val got = df.select(double_units($"x", 2)).as[Option[Long]].collect().toSet
    assert(got == Set(Some(1234L), None))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(double_units($"x", 2)).collect()
    }
  }
}
