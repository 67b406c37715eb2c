package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry sanity: every SURVEY §2 capability registered in
  * SparkEntry.queries runs end-to-end on the smoke scale factor.
  */
class RegistrySpec extends AnyFunSuite {
  import SparkTestBase._

  test("query names are unique and oracles reference real queries") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("EVERY registered query is oracle-checked (no rows-only entries)") {
    // As of round 7 the full registry (incl. the iterative trainers —
    // IVF, k-means, logistic GD, BPE) has DuckDB oracles; the driver
    // counts a no_oracle entry as an error, so a new rows-only query
    // is a correctness-score regression. If a genuinely inexpressible
    // operator ever lands, allowlist it HERE with the reason.
    val rowsOnly = SparkEntry.all.map(_.name).toSet --
      SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without oracle SQL: ${rowsOnly.toSeq.sorted.mkString(", ")}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (d <- SparkEntry.all)
    test(s"${d.name} executes on sf0.001") {
      val n = d.run(spark, sfDir).count()
      assert(n >= 0)
      // Every query except the degenerate ones should produce output.
      if (d.name != "q_ann_lsh_bucketed") assert(n > 0, s"${d.name} empty")
    }

  test("histogram bin counts sum to the row count") {
    val bins = SparkEntry.queries("q_agg_histogram")(spark, sfDir)
    val total = bins.agg(org.apache.spark.sql.functions.sum("y"))
      .collect()(0).getLong(0)
    val rows = T.t(spark, sfDir, "lineitem").count()
    assert(total === rows)
  }

  test("histogram_numeric (adaptive bins) preserves total mass") {
    // The Hive UDAF itself (GenericUDAFHistogramNumeric semantics):
    // adaptive centers have no SQL oracle, so assert the invariants —
    // requested bin count and total bin mass = row count.
    import org.apache.spark.sql.functions._
    val h = T.t(spark, sfDir, "lineitem")
      .agg(expr("histogram_numeric(l_extendedprice, 8)").as("h"))
      .select(explode(col("h")).as("bin"))
      .select(col("bin.x").as("x"), col("bin.y").as("y"))
    assert(h.count() === 8)
    val mass = h.agg(sum("y")).collect()(0).getDouble(0)
    val rows = T.t(spark, sfDir, "lineitem").count()
    assert(math.round(mass) === rows)
    // Centers must be ordered and within the data range.
    val xs = h.orderBy("x").collect().map(_.getDouble(0))
    assert(xs.sameElements(xs.sorted))
  }

  test("soundex matches the canonical published codes") {
    // No DuckDB twin exists — pin the classic reference vectors
    // (Knuth TAOCP vol. 3 / the US census algorithm) instead.
    import spark.implicits._
    val got = Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister")
      .toDF("name").selectExpr("soundex(name)").as[String].collect()
    assert(got.sameElements(Seq("R163", "R163", "A261", "T522", "P236")))
  }
}
