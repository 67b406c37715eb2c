package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 (optimization round 15) pins.
  *
  * 1. ADAPTIVE TOP-K PARITY: the four scale-flagged queries
  *    (q_ann_ivf_cells, q_ann_ivf_hier, q_ann_lsh_bucketed,
  *    q_dedup_semantic) pick between the rank-window form (below
  *    TopKAgg.engageBytes — every local SF) and the bounded top-k
  *    aggregate (corpus scale / forced). A wrong-side decision must
  *    change only the plan, never the result — proven here by running
  *    each query BOTH ways on the same data and comparing full
  *    row-sets. This is the Round9OpsSpec forced-bit-equivalence
  *    template applied to the r15 rewrite.
  *
  * 2. CUTOVER DIRECTION: engage() is false at test SF (so the frozen
  *    window plans stay the bench reality) and true once the estimate
  *    crosses engageBytes — pinned so a future "simplification" to a
  *    constant branch fails the build (the rangeParts lesson).
  */
class Round17OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def runBoth(name: String): (Seq[String], Seq[String]) = {
    val d = SparkEntry.all.find(_.name == name).get
    def rows(): Seq[String] = {
      val df = d.run(spark, dir)
      val out = df.collect().map(_.toString).toSeq.sorted
      T.releaseScratch(spark)
      out
    }
    spark.conf.set("spark.graft.topk.forceAgg", "false")
    val window = rows()
    spark.conf.set("spark.graft.topk.forceAgg", "true")
    val agg = try rows()
    finally spark.conf.set("spark.graft.topk.forceAgg", "false")
    (window, agg)
  }

  for (q <- Seq("q_ann_ivf_cells", "q_ann_ivf_hier", "q_ann_lsh_bucketed",
    "q_dedup_semantic")) {
    test(s"$q: window form == forced collect_topk form (row-set parity)") {
      val (w, a) = runBoth(q)
      assert(w.nonEmpty, s"$q returned no rows")
      assert(w == a, s"$q: adaptive top-k branches disagree")
    }
  }

  test("TopKAgg.engage gates on the size estimate, not a constant") {
    import spark.implicits._
    val tiny = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "g")
    assert(!TopKAgg.engage(tiny),
      "tiny frame must take the window path (bench plans frozen)")
    // Force flag overrides (what the parity tests above rely on).
    spark.conf.set("spark.graft.topk.forceAgg", "true")
    try assert(TopKAgg.engage(tiny))
    finally spark.conf.set("spark.graft.topk.forceAgg", "false")
    // The threshold is the RankSelect-style bytes estimate: a frame the
    // optimizer prices above engageBytes engages. spark.range is priced
    // at 8 bytes/row, so 2^25 rows ≈ 256 MiB > the 128 MiB threshold.
    val big = spark.range(1L << 25).toDF("id")
    assert(TopKAgg.engage(big),
      "corpus-scale estimate must engage the bounded top-k aggregate")
  }
}
