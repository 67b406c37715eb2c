package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide hardening of the dormant StatsAnswer rule: forcing
  * `spark.graft.stats.answerQueries=true` across the ENTIRE registry
  * must change NOTHING — the rule's only legitimate firing surface is
  * a global count/min/max aggregate over a bare ANALYZEd catalog
  * table, which exactly one registered query (q_stats_metadata_only)
  * constructs for itself.
  *
  * Two layers, cheapest-first:
  *  - plan identity for ALL registered queries: the physical-plan
  *    signature (plans.PlanGolden) with the flag ON equals the one
  *    with it OFF. A misfire replaces a scan subtree with a
  *    LocalRelation, which cannot survive signature equality — and
  *    because each query is CONSTRUCTED under the flag, driver-side
  *    sub-jobs (model collects) run through the flagged optimizer too.
  *  - result identity for the plan-golden corpus (the 36 most
  *    expensive, most plan-diverse queries): full collected output
  *    with the flag ON is row-for-row identical to flag OFF, catching
  *    any rewrite that kept the plan shape but changed values.
  */
class StatsAnswerFuzzSpec extends AnyFunSuite {
  import SparkTestBase._

  private def withFlag[A](on: Boolean)(body: => A): A = {
    if (on) spark.conf.set(StatsAnswer.Flag, "true")
    else spark.conf.unset(StatsAnswer.Flag)
    try body finally spark.conf.unset(StatsAnswer.Flag)
  }

  test("flag ON changes no registered query's plan shape") {
    val drifted = SparkEntry.all.flatMap { qd =>
      val off = withFlag(on = false) {
        plans.PlanGolden.signature(qd.run(spark, sfDir))
      }
      val on = withFlag(on = true) {
        plans.PlanGolden.signature(qd.run(spark, sfDir))
      }
      if (off != on) Some(qd.name) else None
    }
    assert(drifted.isEmpty,
      s"StatsAnswer rewrote plans it must not touch: ${drifted.mkString(", ")}")
  }

  test("flag ON changes no result in the plan-golden corpus") {
    val corpus = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q16_supplier_part_count", "q18_large_volume", "q2_min_cost_supplier",
      "q_dedup_containment", "q_ann_ivf_cells", "q_text_bm25",
      "q_audit_drift", "q_quality_train", "q_sample_dsir",
      "q_graph_triangles", "q_join_merge_bigbig", "q_intersect_all",
      "q_dedup_simhash", "q_scd2_pointintime")
    corpus.foreach { name =>
      val off = withFlag(on = false) {
        SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      }
      val on = withFlag(on = true) {
        SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      }
      assert(off === on, s"result drift under stats flag: $name")
    }
  }
}
