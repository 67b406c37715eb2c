package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash64 (native shuffle-free kernel) vs the relational formulation
  * (explode → per-token count → 64 signed sums → bit assembly) — BIT
  * equality on real documents (the band blocking depends on it), in
  * both eval paths, plus edge cases and analysis errors.
  */
class SimHash64Spec extends AnyFunSuite {
  import SparkTestBase._

  /** The round-3 relational SimHash, kept as the reference oracle. */
  private def relational = {
    val tok = T.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tokv"))
      .groupBy("doc_id", "tokv").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tokv")))
    val bitSums = (0 until 64).map(j =>
      sum(when(expr(s"(h >> $j) & 1") === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"s$j"))
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      shiftleft(when(col(s"s$j") > 0, 1L).otherwise(0L), j))
      .reduce(_ bitwiseOR _)
    sums.select(col("doc_id"), sig.as("rel"))
  }

  private def mismatches(): Long = {
    val native = T.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        expr("simhash64(split(text, ' '))").as("native"))
    native.join(relational, "doc_id")
      .filter(col("native") =!= col("rel"))
      .count()
  }

  test("bit-identical to the relational form under codegen") {
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

  test("single token: signature equals the token's hash bit pattern") {
    HiveCompatFunctions.ensure(spark)
    // With one token every bit-sum is +1/-1 directly from the hash.
    val r = spark.sql(
      "SELECT simhash64(array('spark')) AS m, xxhash64('spark') AS h")
      .collect()(0)
    assert(r.getLong(0) === r.getLong(1))
  }

  test("empty array yields signature 0 (all bit-sums tie)") {
    HiveCompatFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT simhash64(cast(array() as array<string>)) AS m").collect()(0)
    assert(r.getLong(0) === 0L)
  }

  test("null array yields null") {
    HiveCompatFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT simhash64(cast(null as array<string>)) AS m").collect()(0)
    assert(r.isNullAt(0))
  }

  test("wrong input types fail at analysis, not execution") {
    HiveCompatFunctions.ensure(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(1, 2))").collect()
    }
    assert(ex.getMessage.contains("array<string>"))
  }
}
