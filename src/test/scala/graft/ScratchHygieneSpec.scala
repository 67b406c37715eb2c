package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of T.releaseScratch / T.pinning — the between-statements
  * block hygiene the harness relies on (Bench/Verify call releaseScratch
  * after every query; Dedup's shared-artifact memo pins through
  * T.pinning). Without this, eager localCheckpoint scratch accumulates
  * across a long session and storage pressure inflates later queries.
  */
class ScratchHygieneSpec extends AnyFunSuite {
  import SparkTestBase._

  test("releaseScratch drops checkpoint scratch but keeps pinned artifacts") {
    import spark.implicits._
    val sc = spark.sparkContext
    T.releaseScratch(spark) // start from a clean slate

    // Unpinned scratch: the shape every iterative operator leaves behind.
    val scratch = (1 to 1000).toDF("x").localCheckpoint(true)
    assert(scratch.count() == 1000)

    // Pinned artifact: the Dedup-memo shape that must outlive queries.
    val keep = T.pinning(spark)((1 to 500).toDF("y").localCheckpoint(true))
    assert(keep.count() == 500)

    val before = sc.getPersistentRDDs.size
    assert(before >= 2, s"expected both checkpoints persisted, saw $before")

    T.releaseScratch(spark)
    // Async unpersist: wait for the scratch blocks to drain.
    val deadline = System.nanoTime() + 10e9.toLong
    while (sc.getPersistentRDDs.size > 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(sc.getPersistentRDDs.size == 1,
      s"only the pinned RDD should survive, saw ${sc.getPersistentRDDs.size}")

    // The pinned artifact is still fully readable after the sweep
    // (its blocks were never touched — lineage truncation is safe).
    assert(keep.count() == 500)
  }
}
