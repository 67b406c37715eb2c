package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order clustering: the key must be exact Morton interleaving (bit
  * reference), and the clustered LAYOUT must actually prune — a box
  * filter on the dimension the linear layout did NOT sort by should
  * scan fewer parquet rows from the z-clustered copy (row-group
  * min/max skipping), which is the entire point of the operator.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("zkey is exact Morton interleaving") {
    val cases = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (1L, 2L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (70000L, 150L))
    def refSpread(v: Long): Long =
      (0 until 16).map(i => (((v % 65536) >> i) & 1L) << (2 * i)).sum
    val want = cases.map { case (x, y) =>
      refSpread(x) | (refSpread(y) << 1)
    }
    val got = cases.toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(got.toSeq === want)
    assert(got(0) === 39L) // x=3 → 0b101, y=5 → 0b10001<<1 = 0b100010
  }

  test("z-clustered files prune a date box the linear layout cannot") {
    // Day ordinal as BIGINT: parquet row-group stats on timestamp_ntz
    // are NOT used for pruning (verified on this Spark — a pushed
    // timestamp filter still scans every row group), so a prunable
    // layout clusters and filters on the date ORDINAL. Same at 100 TB.
    val orders = T.t(spark, sfDir, "orders").withColumn("o_day",
      datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"))
    val total = orders.count()
    val tmp = SparkTestBase.tmpDir("graft_zorder").toString
    try {
      // Linear layout: clustered by custkey ONLY — the "first access
      // pattern" sort every table already has.
      orders.repartitionByRange(16, col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(s"$tmp/linear")
      ZOrder.writeClustered(orders, col("o_custkey"), col("o_day"),
        16, s"$tmp/zorder")

      // Rows the parquet scan PRODUCES (post row-group pruning, before
      // the exact Filter) for a 2-month date box — the second access
      // pattern, which the custkey sort knows nothing about.
      def scanned(path: String): Long = {
        val df = spark.read.parquet(path)
          .filter(col("o_day") >= 1096 && col("o_day") < 1156)
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => a.executedPlan
          case other => other
        }
        val ns = plan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }
        assert(ns.nonEmpty, s"no FileSourceScan in:\n$plan")
        ns.sum
      }
      val lin = scanned(s"$tmp/linear")
      val zo = scanned(s"$tmp/zorder")
      info(s"date-box scan: linear=$lin zorder=$zo total=$total")
      // Both layouts return identical ROWS (correctness is layout-
      // independent); the z-clustered scan must READ materially less.
      assert(zo < lin, s"z-order pruned nothing: zorder=$zo linear=$lin")
      assert(zo <= total / 2,
        s"z-order scan read $zo of $total rows — row groups not pruned")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(tmp))
    }
  }
}
