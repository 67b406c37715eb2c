package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHashSigs (native one-pass kernel) vs the composed
  * array_min(transform(..., xxhash64(j, v))) formulation — BIT equality
  * per signature slot on real shingle data (the LSH bands depend on
  * it), in both eval paths, plus edge cases and analysis errors.
  */
class MinHashSigsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def shingles = T.t(spark, sfDir, "documents")
    .filter(col("doc_id") < 200)
    .withColumn("w", split(col("text"), " "))
    .filter(size(col("w")) >= 3)
    .select(col("doc_id"), expr(
      "array_distinct(transform(sequence(1, size(w) - 2)," +
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)," +
        " ' ', element_at(w, i + 2))))").as("shingles"))

  private def mismatches(): Long = {
    val composed = (0 until 24).map(k =>
      expr(s"array_min(transform(shingles, v -> xxhash64($k, v)))"))
    shingles
      .withColumn("native", expr("minhash_sigs(shingles, 24)"))
      .withColumn("composed", array(composed: _*))
      .filter(col("native") =!= col("composed"))
      .count()
  }

  test("bit-identical to the composed form under codegen") {
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

  test("single-element set: every slot is that element's seeded hash") {
    HiveCompatFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT minhash_sigs(array('spark'), 4) AS m," +
        " array(xxhash64(0, 'spark'), xxhash64(1, 'spark')," +
        " xxhash64(2, 'spark'), xxhash64(3, 'spark')) AS c").collect()(0)
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("empty array yields the per-slot seeds (documented divergence)") {
    HiveCompatFunctions.ensure(spark)
    // Seeds equal xxhash64(j, NULL) — the chain with the string skipped.
    val r = spark.sql(
      "SELECT minhash_sigs(cast(array() as array<string>), 3) AS m," +
        " array(xxhash64(0, cast(null as string))," +
        " xxhash64(1, cast(null as string))," +
        " xxhash64(2, cast(null as string))) AS seeds").collect()(0)
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("null array yields null") {
    HiveCompatFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT minhash_sigs(cast(null as array<string>), 4) AS m")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("wrong input types fail at analysis, not execution") {
    HiveCompatFunctions.ensure(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sigs(array(1, 2), 4)").collect()
    }
    assert(ex.getMessage.contains("array<string>"))
  }

  test("non-literal count raises a clear error") {
    HiveCompatFunctions.ensure(spark)
    val ex = intercept[Exception] {
      spark.range(3).selectExpr(
        "minhash_sigs(array('a'), cast(id as int))").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
