package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JaccardParts (native codegen'd Expression) vs the composed
  * array_intersect/array_union formulation — equivalence on real
  * shingle data and edge cases, in BOTH eval paths (whole-stage codegen
  * on and off).
  */
class JaccardPartsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def pairs = {
    val sh = T.t(spark, sfDir, "documents").filter(col("doc_id") < 60)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), expr(
        "array_distinct(zip_with(slice(w, 1, size(w) - 1)," +
          " slice(w, 2, size(w) - 1), (a, b) -> concat(a, ' ', b)))").as("s"))
    val a = sh.select(col("doc_id").as("a_id"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("b_id"), col("s").as("sb"))
    a.join(b, col("a_id") < col("b_id"))
  }

  private def mismatches(): Long =
    pairs
      .withColumn("jp", expr("jaccard_parts(sa, sb)"))
      .withColumn("i1", expr("shiftright(jp, 32)").cast("int"))
      .withColumn("u1", col("jp").bitwiseAND(0xFFFFFFFFL).cast("int"))
      .withColumn("i2", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("u2", size(array_union(col("sa"), col("sb"))))
      .filter(col("i1") =!= col("i2") || col("u1") =!= col("u2"))
      .count()

  test("agrees with array_intersect/array_union under codegen") {
    HiveCompatFunctions.ensure(spark)
    assert(mismatches() === 0)
  }

  test("agrees with codegen disabled (interpreted eval path)") {
    HiveCompatFunctions.ensure(spark)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(mismatches() === 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("edge cases: empty arrays and duplicates") {
    import spark.implicits._
    HiveCompatFunctions.ensure(spark)
    val df = Seq(
      (Seq.empty[String], Seq.empty[String]),      // 0 / 0
      (Seq("a", "a", "b"), Seq("b", "b", "c")),    // dup inputs: 1 / 3
      (Seq("x"), Seq.empty[String]),               // 0 / 1
      (Seq("x", "y"), Seq("x", "y"))               // 2 / 2
    ).toDF("sa", "sb")
      .withColumn("jp", expr("jaccard_parts(sa, sb)"))
      .select(expr("shiftright(jp, 32)").cast("int"),
        col("jp").bitwiseAND(0xFFFFFFFFL).cast("int"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((0, 0), (1, 3), (0, 1), (2, 2)))
  }

  test("wrong input types fail at analysis, not execution") {
    HiveCompatFunctions.ensure(spark)
    val df = spark.range(1)
      .selectExpr("array(1, 2) AS a", "array('x') AS b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("jaccard_parts(a, b)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<string>"))
  }

  test("wrong arity raises a clear error") {
    HiveCompatFunctions.ensure(spark)
    val ex = intercept[Exception] {
      spark.range(1).selectExpr("jaccard_parts(array('a'))").collect()
    }
    assert(ex.getMessage.contains("exactly 2"))
  }
}
