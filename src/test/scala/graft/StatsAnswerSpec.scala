package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StatsAnswer (plans/StatsAnswer.scala) — Hive StatsOptimizer twin:
  * metadata-only answers for global count/min/max aggregates over an
  * ANALYZEd table, with Hive's exact accuracy contract (conf-gated,
  * stats-presence-gated, silently disabled by writes until the next
  * ANALYZE).
  */
class StatsAnswerSpec extends AnyFunSuite {
  import SparkTestBase._

  private def scanless(df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    !p.contains("FileScan") && !p.contains("Scan parquet")
  }

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set(StatsAnswer.Flag, on.toString)
    try f finally spark.conf.unset(StatsAnswer.Flag)
  }

  test("ANALYZEd table answers count/min/max from the catalog, scanless") {
    SparkEntry.tune(spark)
    spark.sql("DROP TABLE IF EXISTS sa_t")
    T.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .write.saveAsTable("sa_t")
    spark.sql("ANALYZE TABLE sa_t COMPUTE STATISTICS FOR COLUMNS" +
      " o_orderkey, o_custkey")
    // Ground truth from a real scan (flag off).
    val truth = spark.table("sa_t")
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey"),
        count("o_custkey")).head
    withFlag(true) {
      val q = spark.table("sa_t")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"),
          max("o_orderkey").as("mx"), count("o_custkey").as("nc"))
      assert(scanless(q), "stats-answerable aggregate still scanned:\n" +
        q.queryExecution.executedPlan)
      assert(q.head === truth)
    }
  }

  test("count(col) subtracts the recorded null count") {
    SparkEntry.tune(spark)
    spark.sql("DROP TABLE IF EXISTS sa_nulls")
    spark.range(100)
      .select(col("id"),
        when(col("id") % 10 === 0, col("id")).as("v"))
      .write.saveAsTable("sa_nulls")
    spark.sql("ANALYZE TABLE sa_nulls COMPUTE STATISTICS FOR COLUMNS v")
    withFlag(true) {
      val q = spark.table("sa_nulls").agg(count(col("v")).as("nv"))
      assert(scanless(q))
      assert(q.head.getLong(0) === 10L)
    }
  }

  test("filters, grouping, or unanswerable aggregates disable the rewrite") {
    SparkEntry.tune(spark)
    withFlag(true) {
      val filtered = spark.table("sa_t")
        .filter(col("o_orderstatus") === "F").agg(count(lit(1)))
      assert(!scanless(filtered), "filtered aggregate must scan")
      val grouped = spark.table("sa_t")
        .groupBy("o_orderstatus").agg(count(lit(1)))
      assert(!scanless(grouped), "grouped aggregate must scan")
      val summed = spark.table("sa_t").agg(sum("o_orderkey"))
      assert(!scanless(summed), "sum is not stats-answerable, must scan")
      val distinct = spark.table("sa_t")
        .agg(countDistinct(col("o_custkey")))
      assert(!scanless(distinct), "DISTINCT agg must scan")
      // min over a column with NO column stats (o_orderstatus was not
      // analyzed, and strings record no min/max anyway) must scan.
      val noStats = spark.table("sa_t").agg(min("o_orderstatus"))
      assert(!scanless(noStats), "min without column stats must scan")
    }
  }

  test("flag off means no rewrite even with stats present") {
    SparkEntry.tune(spark)
    withFlag(false) {
      assert(!scanless(spark.table("sa_t").agg(count(lit(1)))))
    }
  }

  test("a write invalidates stats until the next ANALYZE (Hive accuracy contract)") {
    SparkEntry.tune(spark)
    spark.sql("DROP TABLE IF EXISTS sa_w")
    spark.range(50).write.saveAsTable("sa_w")
    spark.sql("ANALYZE TABLE sa_w COMPUTE STATISTICS")
    withFlag(true) {
      val before = spark.table("sa_w").agg(count(lit(1)).as("n"))
      assert(scanless(before) && before.head.getLong(0) === 50L)
      // Append WITHOUT re-analyzing: Spark's write path drops the
      // rowCount, so the rule must fall back to a real scan and return
      // the true, current count.
      spark.range(50, 70).write.mode("append").saveAsTable("sa_w")
      val after = spark.table("sa_w").agg(count(lit(1)).as("n"))
      assert(after.head.getLong(0) === 70L,
        "stale stats served after a write — accuracy contract broken")
      assert(!scanless(after),
        "rule fired on a table whose stats a write invalidated")
      // Re-ANALYZE restores the metadata-only path at the new count.
      spark.sql("ANALYZE TABLE sa_w COMPUTE STATISTICS")
      val again = spark.table("sa_w").agg(count(lit(1)).as("n"))
      assert(scanless(again) && again.head.getLong(0) === 70L)
    }
  }
}
