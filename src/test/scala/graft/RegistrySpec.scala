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
      .collect()(0).getDouble(0)
    val rows = T.t(spark, sfDir, "lineitem").count()
    assert(math.round(total) === rows)
  }
}
