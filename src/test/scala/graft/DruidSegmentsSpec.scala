package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Druid-handler parity slice's non-oracle contracts:
  * (1) an interval query is PLAN-level segment pruning — the `__day`
  * bounds are PARTITION filters (directory selection), never a full
  * datasource scan; (2) rollup actually compresses (segment rows ≪ raw
  * events) and its partials re-aggregate to the raw answer exactly;
  * (3) intervals are end-EXCLUSIVE.
  */
class DruidSegmentsSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val ds = sources.DruidSegments.ensureDatasource(spark, sfDir)

  test("rollup compresses and re-aggregates exactly") {
    val raw = T.t(spark, sfDir, "events")
    val seg = spark.read.parquet(ds)
    val nRaw = raw.count()
    val nSeg = seg.count()
    // Strict compression at every SF; the ratio grows with data (hour
    // buckets × 5 types is a FIXED domain, so sf0.1's 100k events
    // roll up ~28×, and the ratio only improves with scale — the
    // Druid storage win). At the spec's tiny sf0.001 the domain is
    // sparsely hit, so assert strictness, not a factor.
    assert(nSeg < nRaw, s"rollup must compress: $nSeg vs $nRaw raw")
    // Partial counts and exact-decimal partial sums re-aggregate to
    // the raw totals bit-for-bit.
    val fromSeg = seg.agg(sum("cnt").cast("long"),
      sum("value_sum").cast("double")).head()
    val fromRaw = raw.agg(count(lit(1)),
      sum(T.dec(col("value"))).cast("double")).head()
    assert(fromSeg.getLong(0) === fromRaw.getLong(0))
    assert(java.lang.Double.doubleToLongBits(fromSeg.getDouble(1)) ===
      java.lang.Double.doubleToLongBits(fromRaw.getDouble(1)))
  }

  test("interval scan compiles to segment-directory pruning") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = sources.DruidSegments
      .scanInterval(spark, ds, "2024-01-08", "2024-01-22")
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata
    }
    assert(scans.nonEmpty)
    val m = scans.head
    assert(m("PartitionFilters").contains("__day"),
      s"interval must be a PARTITION filter: $m")
  }

  test("intervals are end-exclusive and match a raw-event filter") {
    val seg = sources.DruidSegments
      .scanInterval(spark, ds, "2024-01-08", "2024-01-10")
    val segDays = seg.select("__day").distinct().collect()
      .map(_.getDate(0).toString).sorted
    assert(segDays.sameElements(Array("2024-01-08", "2024-01-09")))
    val nSeg = seg.agg(sum("cnt")).head().getLong(0)
    val nRaw = T.t(spark, sfDir, "events")
      .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
        col("ts") < lit("2024-01-10").cast("timestamp"))
      .count()
    assert(nSeg === nRaw)
  }

  test("sub-day end bound keeps the final day's early hours") {
    // Regression (ADVICE r10): `__day < cast(end AS date)` dropped the
    // entire end day for a sub-day bound like 06:00 — the partition
    // bound must be inclusive of the end timestamp's date, with the
    // exclusive `__time < end` residual doing the trimming.
    val end = "2024-01-09 06:00:00"
    val seg = sources.DruidSegments.scanInterval(spark, ds, "2024-01-08", end)
    val nSeg = seg.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    val nRaw = T.t(spark, sfDir, "events")
      .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
        col("ts") < lit(end).cast("timestamp"))
      .count()
    assert(nSeg === nRaw)
    // And the rows must include 2024-01-09 hours [00:00, 06:00) when
    // any exist in the raw data (at sf0.001 the day may be sparse, so
    // compare against raw rather than asserting non-zero).
    val endDayRaw = T.t(spark, sfDir, "events")
      .filter(col("ts") >= lit("2024-01-09").cast("timestamp") &&
        col("ts") < lit(end).cast("timestamp"))
      .count()
    val endDaySeg = seg
      .filter(col("__day") === lit("2024-01-09").cast("date"))
      .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    assert(endDaySeg === endDayRaw)
  }
}
