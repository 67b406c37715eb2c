package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DotProduct (native codegen'd `dot_f` Expression) vs the composed
  * aggregate(zip_with(...)) formulation — BIT equality on real embedding
  * data (the ANN oracles depend on it), in both eval paths, plus edge
  * cases and analysis-time type/arity errors.
  */
class DotProductSpec extends AnyFunSuite {
  import SparkTestBase._

  private val hof =
    "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * " +
      "CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def pairs = {
    val e = T.t(spark, sfDir, "embeddings").filter(col("vec_id") < 40)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("a_id") <= col("b_id")) // includes self-pairs (norms)
  }

  private def mismatches(): Long =
    pairs
      .withColumn("d1", expr("dot_f(ea, eb)"))
      .withColumn("d2", expr(hof))
      // Bit equality, not epsilon: the kernel must accumulate in the
      // exact same order for the oracle hashes to stay green. xxhash64
      // hashes the raw 8-byte double representation, so differing bits
      // (including -0.0 vs 0.0) differ here.
      .filter(expr("xxhash64(d1) <> xxhash64(d2)"))
      .count()

  test("bit-identical to aggregate(zip_with(...)) under codegen") {
    HiveCompatFunctions.ensure(spark)
    assert(mismatches() === 0)
  }

  test("bit-identical with codegen disabled (interpreted eval path)") {
    HiveCompatFunctions.ensure(spark)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(mismatches() === 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("edge cases: empty vectors, null vector, null element") {
    import spark.implicits._
    HiveCompatFunctions.ensure(spark)
    val rows = Seq(
      (Seq.empty[Float], Seq.empty[Float]),    // 0.0
      (Seq(1.5f, 2.0f), Seq(2.0f, 0.5f)),      // 4.0
      (null, Seq(1.0f))                        // NULL vector -> NULL
    ).toDF("ea", "eb")
      .withColumn("d", expr("dot_f(ea, eb)"))
      .select("d").collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(1).getDouble(0) === 4.0)
    assert(rows(2).isNullAt(0))
    // NULL element -> NULL (matches the zip_with composition).
    val withNullElem = spark.sql(
      "SELECT dot_f(array(cast(1.0 as float), cast(null as float))," +
        " array(cast(2.0 as float), cast(3.0 as float))) AS d").collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("mixed float/double sides widen like the CAST composition") {
    HiveCompatFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT dot_f(array(cast(1.5 as float), cast(2.0 as float))," +
        " array(2.0d, 0.25d)) AS d").collect()(0)
    assert(r.getDouble(0) === 3.5)
  }

  test("wrong input types fail at analysis, not execution") {
    HiveCompatFunctions.ensure(spark)
    val df = spark.range(1)
      .selectExpr("array(1, 2) AS a", "array(cast(1.0 as float)) AS b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("dot_f(a, b)").collect()
    }
    assert(ex.getMessage.contains("array<float> or array<double>"))
  }

  test("wrong arity raises a clear error") {
    HiveCompatFunctions.ensure(spark)
    val ex = intercept[Exception] {
      spark.range(1).selectExpr("dot_f(array(cast(1.0 as float)))").collect()
    }
    assert(ex.getMessage.contains("exactly 2"))
  }
}
