package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Window frames vs the brute-force self-join definition (the
  * windowing-equivalence property SURVEY §5 suggests): a ROWS frame sum
  * equals the correlated-subquery formulation row for row.
  */
class WindowFrameSpec extends AnyFunSuite {
  import SparkTestBase._

  test("RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW equals brute force") {
    val o = T.t(spark, sfDir, "orders").filter(col("o_orderkey") < 2000)
      .select(col("o_orderstatus"), col("o_orderkey"),
        T.dec(col("o_totalprice")).as("p"))
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      .rangeBetween(-1000, Window.currentRow)
    val viaWindow = o
      .select(col("o_orderstatus"), col("o_orderkey"),
        sum(col("p")).over(w).as("rsum"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDecimal(2)).toMap
    // Brute force: self-join on the VALUE band (the definition of a
    // RANGE frame), aggregate.
    val l = o.select(col("o_orderstatus").as("st"), col("o_orderkey"))
    val r = o.select(col("o_orderstatus").as("st2"),
      col("o_orderkey").as("k2"), col("p"))
    val viaJoin = l.join(r, col("st") === col("st2") &&
        col("k2").between(col("o_orderkey") - 1000, col("o_orderkey")))
      .groupBy(col("st"), col("o_orderkey"))
      .agg(sum(col("p")).as("rsum"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getDecimal(2)).toMap
    assert(viaWindow === viaJoin)
  }

  test("ROWS BETWEEN 2 PRECEDING AND CURRENT ROW equals brute force") {
    val o = T.t(spark, sfDir, "orders").filter(col("o_custkey") < 40)
      .select(col("o_custkey"), col("o_orderkey"),
        T.dec(col("o_totalprice")).as("p"))
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(-2, Window.currentRow)
    val viaWindow = o
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("p")).over(w).as("mov"))
    // Brute force: rank each row per key, self-join the 3-row band.
    val rw = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val ranked = o.withColumn("rn", row_number().over(rw))
    val l = ranked.select(col("o_custkey").as("k"), col("o_orderkey"),
      col("rn"))
    val r = ranked.select(col("o_custkey").as("k2"), col("p"),
      col("rn").as("rn2"))
    val viaJoin = l.join(r, col("k") === col("k2") &&
        col("rn2").between(col("rn") - 2, col("rn")))
      .groupBy(col("k").as("o_custkey"), col("o_orderkey"))
      .agg(sum(col("p")).as("mov"))
    val a = viaWindow.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDecimal(2)).toMap
    val b = viaJoin.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDecimal(2)).toMap
    assert(a === b)
  }
}
