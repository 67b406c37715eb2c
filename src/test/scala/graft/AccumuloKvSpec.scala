package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Accumulo-handler parity slice's non-oracle contracts:
  * (1) a row-range SCAN is PLAN-level — tablet-directory pruning
  * (PartitionFilters on __tablet) plus a parquet row seek
  * (PushedFilters on __row), never a filtered full scan;
  * (2) cell-level VISIBILITY: a cell surfaces iff every label of its
  * '&'-conjunction is held — single labels and conjunctions, grant
  * and deny directions both;
  * (3) scans are stop-EXCLUSIVE and agree with a brute-force filter;
  * (4) tablets own contiguous, non-overlapping row ranges and cells
  * arrive row-clustered (the WholeRowIterator precondition).
  */
class AccumuloKvSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val store = sources.AccumuloKv.ensureStore(spark, sfDir, 6)

  private val allAuths = Set("public", "finance", "pii", "ops")

  test("tablets own contiguous non-overlapping row ranges") {
    val kv = spark.read.parquet(store)
    val tablets = kv.select("__tablet").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(tablets.nonEmpty && tablets.forall(t => t >= 0 && t < 6))
    val bounds = kv.groupBy("__tablet")
      .agg(min("__row").as("lo"), max("__row").as("hi"))
      .orderBy("__tablet").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    bounds.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }

  test("range scan compiles to tablet pruning + row pushdown") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = sources.AccumuloKv.scanRange(spark, store,
      sources.AccumuloKv.rowkey(2L), sources.AccumuloKv.rowkey(8L), allAuths)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata
    }
    assert(scans.nonEmpty)
    val m = scans.head
    assert(m("PartitionFilters").contains("__tablet"),
      s"tablet selection must be a PARTITION filter: $m")
    assert(m("PushedFilters").contains("GreaterThanOrEqual(__row"),
      s"row start must push to parquet: $m")
    assert(m("PushedFilters").contains("LessThan(__row"),
      s"row stop must push to parquet: $m")
  }

  test("cell-level visibility: labels and conjunctions, both directions") {
    val lo = sources.AccumuloKv.rowkey(0L)
    val hi = sources.AccumuloKv.rowkey(10L)
    def cqs(auths: Set[String]): Set[String] =
      sources.AccumuloKv.scanRange(spark, store, lo, hi, auths)
        .select("__cq").distinct().collect().map(_.getString(0)).toSet
    // public alone: only the public cells
    assert(cqs(Set("public")) === Set("name", "nationkey"))
    // + finance: acctbal appears
    assert(cqs(Set("public", "finance")) ===
      Set("name", "nationkey", "acctbal"))
    // pii WITHOUT ops: the pii&ops conjunction must NOT surface
    assert(cqs(Set("public", "pii")) === Set("name", "nationkey"))
    // pii AND ops: phone appears (even without public — per-cell, not
    // per-row: the public cells drop, the conjunction cell survives)
    assert(cqs(Set("pii", "ops")) === Set("contact"))
    // no auths: nothing
    assert(cqs(Set.empty).isEmpty)
  }

  test("scan is stop-exclusive and agrees with a brute-force filter") {
    val lo = sources.AccumuloKv.rowkey(2L)
    val hi = sources.AccumuloKv.rowkey(8L)
    val scanned = sources.AccumuloKv.scanRange(spark, store, lo, hi, allAuths)
      .select("__row").collect().map(_.getString(0)).sorted
    val brute = spark.read.parquet(store)
      .filter(col("__row") >= lo && col("__row") < hi)
      .select("__row").collect().map(_.getString(0)).sorted
    assert(scanned.sameElements(brute))
    assert(scanned.nonEmpty)
    assert(!scanned.contains(hi))
    // every visible row carries its full visible cell run (4 cells
    // under all auths — the WholeRowIterator reassembly precondition)
    val runs = sources.AccumuloKv.scanRange(spark, store, lo, hi, allAuths)
      .groupBy("__row").count().select("count").distinct().collect()
      .map(_.getLong(0))
    assert(runs.sameElements(Array(4L)))
    // degenerate scan is empty, not an error
    assert(sources.AccumuloKv.scanRange(spark, store, hi, lo, allAuths)
      .count() === 0L)
  }

  test("point get addresses exactly its row") {
    val one = sources.AccumuloKv.get(spark, store,
      sources.AccumuloKv.rowkey(5L), Set("public"))
    val rows = one.select("__row").distinct().collect().map(_.getString(0))
    assert(rows.sameElements(Array(sources.AccumuloKv.rowkey(5L))))
    assert(one.count() === 2L) // the two public cells
  }
}
