package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HBase-handler parity slice's non-oracle contracts:
  * (1) a rowkey range SCAN is PLAN-level — region-directory pruning
  * (PartitionFilters on __region) plus a parquet rowkey seek
  * (PushedFilters on __row_key), never a filtered full scan;
  * (2) point GET / multi-GET address exactly their keys with the same
  * pruning; (3) scan semantics are stop-EXCLUSIVE and agree with a
  * brute-force filter of the full store.
  */
class HBaseKvSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val store = sources.HBaseKv.ensureStore(spark, sfDir, 8)

  test("store is region-sharded and rowkey-sorted within regions") {
    val kv = spark.read.parquet(store)
    val regions = kv.select("__region").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(regions.nonEmpty && regions.forall(r => r >= 0 && r < 8))
    // Regions own contiguous, non-overlapping rowkey ranges: the max
    // key of region r sorts strictly below the min key of region r+1.
    val bounds = kv.groupBy("__region")
      .agg(min("__row_key").as("lo"), max("__row_key").as("hi"))
      .orderBy("__region").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    bounds.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ => ()
    }
  }

  test("rowkey range scan compiles to region pruning + rowkey pushdown") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = sources.HBaseKv.scanRange(spark, store,
      sources.HBaseKv.rowkey(120L), sources.HBaseKv.rowkey(940L))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata
    }
    assert(scans.nonEmpty)
    val m = scans.head
    assert(m("PartitionFilters").contains("__region"),
      s"region selection must be a PARTITION filter: $m")
    assert(m("PushedFilters").contains("GreaterThanOrEqual(__row_key"),
      s"rowkey start must push to parquet: $m")
    assert(m("PushedFilters").contains("LessThan(__row_key"),
      s"rowkey stop must push to parquet: $m")
  }

  test("scan is stop-exclusive and agrees with a brute-force filter") {
    val lo = sources.HBaseKv.rowkey(120L)
    val hi = sources.HBaseKv.rowkey(940L)
    val scanned = sources.HBaseKv.scanRange(spark, store, lo, hi)
      .select("__row_key").collect().map(_.getString(0)).sorted
    val brute = spark.read.parquet(store)
      .filter(col("__row_key") >= lo && col("__row_key") < hi)
      .select("__row_key").collect().map(_.getString(0)).sorted
    assert(scanned.sameElements(brute))
    assert(scanned.nonEmpty)
    assert(!scanned.contains(hi)) // stopRow itself is never returned
    // Degenerate scan (stop <= start) is empty, not an error.
    assert(sources.HBaseKv.scanRange(spark, store, hi, lo).count() === 0L)
  }

  test("point get and multi-get address exactly their keys") {
    val one = sources.HBaseKv.get(spark, store, 42L).collect()
    assert(one.length === 1)
    assert(one.head.getAs[String]("__row_key") ===
      sources.HBaseKv.rowkey(42L))
    val keys = Seq(7L, 42L, 120L) // all present at the spec's sf0.001
    val many = sources.HBaseKv.multiGet(spark, store, keys)
      .select("__row_key").collect().map(_.getString(0)).sorted
    assert(many.sameElements(keys.map(sources.HBaseKv.rowkey).sorted))
    // A key beyond the store's domain returns empty, not an error.
    assert(sources.HBaseKv.get(spark, store, 999999999L).count() === 0L)
  }
}
