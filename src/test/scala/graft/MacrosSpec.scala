package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CREATE TEMPORARY MACRO semantics (functions/Macros.scala): plan-time
  * expansion, optimizer transparency, redefinition, arity/typo errors.
  */
class MacrosSpec extends AnyFunSuite {
  import SparkTestBase._

  test("macro expands and computes like the inline expression") {
    Macros.define(spark, "sigmoid", Seq("x"), "1.0 / (1.0 + exp(-x))")
    val got = spark.sql("SELECT sigmoid(0.0) AS s, sigmoid(2.0) AS t").head()
    assert(got.getDouble(0) == 0.5)
    assert(math.abs(got.getDouble(1) - 1.0 / (1.0 + math.exp(-2.0))) < 1e-15)
  }

  test("macro with several parameters and nested use") {
    Macros.define(spark, "clamp", Seq("v", "lo", "hi"),
      "least(greatest(v, lo), hi)")
    val df = T.t(spark, sfDir, "lineitem").limit(100)
      .selectExpr("l_quantity", "clamp(l_quantity, 10.0, 20.0) AS c")
    assert(df.filter(col("c") < 10.0 || col("c") > 20.0).count() == 0)
    // Nested macro call sites expand independently.
    val two = spark.sql(
      "SELECT clamp(5.0D, 10.0D, 20.0D) + clamp(25.0D, 10.0D, 20.0D)").head()
    assert(two.getDouble(0) == 30.0)
  }

  test("macro is plan-transparent: filter through it reaches the scan") {
    Macros.define(spark, "frac_disc", Seq("p", "d"), "p * (1.0 - d)")
    val df = T.t(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey", "frac_disc(l_extendedprice, l_discount) AS v")
      .filter(col("v") > 0)
    // No UDF wrapper anywhere: the plan is ordinary arithmetic.
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"macro became a UDF:\n$plan")
  }

  test("redefinition replaces; bad arity and typos fail loudly") {
    Macros.define(spark, "twice", Seq("x"), "x * 2")
    assert(spark.sql("SELECT twice(21)").head().getInt(0) == 42)
    Macros.define(spark, "twice", Seq("x"), "x * 200")
    assert(spark.sql("SELECT twice(21)").head().getInt(0) == 4200)
    val arity = intercept[Exception](spark.sql("SELECT twice(1, 2)").head())
    assert(arity.getMessage.contains("expects 1 arguments"))
    val typo = intercept[IllegalArgumentException](
      Macros.define(spark, "broken", Seq("x"), "x + y"))
    assert(typo.getMessage.contains("undefined names"))
  }
}
