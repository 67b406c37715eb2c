package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of T.releaseScratch / T.pinning — the between-statements
  * block hygiene the harness relies on (Bench/Verify call releaseScratch
  * after every query; Dedup's shared-artifact memo pins through
  * T.pinning). Without this, eager localCheckpoint scratch accumulates
  * across a long session and storage pressure inflates later queries.
  *
  * Order-robust: other suites sharing this JVM may have pinned their
  * own memo artifacts (Dedup's `materialized`) before this runs —
  * those legitimately survive releaseScratch, so the assertions track
  * the DELTA this test creates (its own scratch must drain, its own
  * pin must survive), not an absolute persistent-RDD count.
  */
class ScratchHygieneSpec extends AnyFunSuite {
  import SparkTestBase._

  test("releaseScratch drops checkpoint scratch but keeps pinned artifacts") {
    import spark.implicits._
    val sc = spark.sparkContext
    T.releaseScratch(spark) // drop any unpinned scratch from other suites
    val baseline = sc.getPersistentRDDs.keySet // surviving foreign pins

    // Unpinned scratch: the shape every iterative operator leaves behind.
    val scratch = (1 to 1000).toDF("x").localCheckpoint(true)
    assert(scratch.count() == 1000)

    // Pinned artifact: the Dedup-memo shape that must outlive queries.
    val keep = T.pinning(spark)((1 to 500).toDF("y").localCheckpoint(true))
    assert(keep.count() == 500)

    val mine = sc.getPersistentRDDs.keySet -- baseline
    assert(mine.size >= 2, s"expected both checkpoints persisted, saw $mine")

    T.releaseScratch(spark)
    // Async unpersist: wait for this test's scratch blocks to drain.
    def survivors = sc.getPersistentRDDs.keySet -- baseline
    val deadline = System.nanoTime() + 10e9.toLong
    while (survivors.size > 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(survivors.size == 1,
      s"only this test's pinned RDD should survive its scratch, saw $survivors")

    // The pinned artifact is still fully readable after the sweep
    // (its blocks were never touched — lineage truncation is safe).
    assert(keep.count() == 500)
    // And no foreign pin was swept either (releaseScratch never grows
    // the baseline, never drops pins).
    assert((baseline -- sc.getPersistentRDDs.keySet).isEmpty,
      "releaseScratch must not drop other suites' pinned artifacts")
  }
}
