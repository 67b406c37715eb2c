package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the graph / sketch / quality operators added with the
  * Graphs pack: PageRank mass conservation and broadcast-iteration plan
  * shape, blocked-linkage never going cartesian, HLL merge-vs-direct
  * identity (the property that makes persisted per-shard sketches
  * legal), cap-sampling determinism, and entropy bounds.
  */
class GraphsSketchSpec extends AnyFunSuite {
  import SparkTestBase._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_graph_pagerank conserves rank mass (no dangling leak)") {
    val rows = run("q_graph_pagerank").collect()
    assert(rows.length >= 2, "degenerate transition graph")
    val total = rows.map(_.getDouble(1)).sum
    // Every node has out-edges in this data, so each iteration maps
    // sum=1 to 0.15 + 0.85*1 = 1; only 6dp rounding noise remains.
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass drifted: $total")
    rows.foreach(r => assert(r.getDouble(1) > 0, "non-positive rank"))
  }

  test("q_graph_pagerank iterates with broadcast joins, no rank shuffle") {
    val p = run("q_graph_pagerank").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "rank vector not broadcast into the iteration joins")
    assert(!p.contains("CartesianProduct"), "cartesian in pagerank plan")
  }

  test("q_link_fuzzy_blocked stays inside blocks (no cartesian product)") {
    val df = run("q_link_fuzzy_blocked")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "blocking failed: plan contains a cartesian product")
    df.collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n_links")) >= 1)
      assert(r.getLong(r.fieldIndex("min_dist")) >= 0)
    }
  }

  test("HLL sharded-merge estimate equals the direct estimate") {
    val ev = T.t(spark, sfDir, "events")
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14))
        .as("est"))
    val merged = ev.withColumn("shard", pmod(col("user_id"), lit(16)))
      .groupBy("event_type", "shard")
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == m, s"merge != direct: $d vs $m")
    // At this cardinality the sketch is still exact (coupon mode).
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == exact, s"sketch left exact mode at test scale: $d vs $exact")
  }

  test("q_sample_cap_per_key keeps min(n_total, 30) deterministically") {
    val first = run("q_sample_cap_per_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    first.foreach { case (_, total, kept, _) =>
      assert(kept == math.min(total, 30L), s"cap violated: $total/$kept")
    }
    val again = run("q_sample_cap_per_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(first.sortBy(_._1).sameElements(again.sortBy(_._1)),
      "cap sample not deterministic across runs")
  }

  test("q_text_entropy stays within [0, ln(max doc tokens)]") {
    val rows = run("q_text_entropy").collect()
    assert(rows.nonEmpty)
    val maxTok = T.t(spark, sfDir, "documents")
      .select(max(size(split(col("text"), " ")))).collect()(0).getInt(0)
    rows.foreach { r =>
      val avg = r.getDouble(r.fieldIndex("avg_entropy"))
      val mx = r.getDouble(r.fieldIndex("max_entropy"))
      assert(avg >= 0 && mx >= avg, s"entropy ordering broken: $avg/$mx")
      assert(mx <= math.log(maxTok.toDouble) + 1e-9,
        s"entropy $mx exceeds ln($maxTok)")
    }
  }

  test("q_funnel_stages counts shrink monotonically down the funnel") {
    val r = run("q_funnel_stages").collect()(0)
    val (v, c, p, done) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(v >= c && c >= p && p >= done,
      s"funnel not monotone: $v >= $c >= $p >= $done")
    assert(v > 0, "empty funnel top")
  }

  test("q_funnel_stages costs one scan and one corpus shuffle") {
    val plan = run("q_funnel_stages").queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"funnel re-scans events: $scans scans")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"funnel should shuffle once on user_id, found $exchanges")
  }

  test("q_cohort_retention offset-0 cell covers each cohort's users") {
    val rows = run("q_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Every user is active in their own first week by construction, so
    // the offset-0 cell is each cohort's max across offsets.
    rows.groupBy(_._1).foreach { case (coh, cells) =>
      val zero = cells.find(_._2 == 0L)
      assert(zero.isDefined, s"cohort $coh missing offset 0")
      assert(cells.forall(_._3 <= zero.get._3),
        s"cohort $coh: an offset exceeds its offset-0 population")
    }
  }

  test("containment rule catches an embedded doc that Jaccard misses") {
    // Synthesize the asymmetric case (absent from the test corpus):
    // a 12-shingle doc fully contained in a 200-shingle doc. Jaccard =
    // 12/200 = 0.06 (far below 0.8); containment = 12/12 = 1.0.
    import spark.implicits._
    HiveCompatFunctions.ensure(spark)
    val small = (1 to 12).map(i => s"g$i")
    val big = (1 to 200).map(i => s"g$i")
    val row = Seq((small, big)).toDF("sa", "sb")
      .withColumn("jp", expr("jaccard_parts(sa, sb)"))
      .withColumn("ni", expr("shiftright(jp, 32)").cast("int"))
      .withColumn("nu", col("jp").bitwiseAND(0xFFFFFFFFL).cast("int"))
      .withColumn("mn", least(size(col("sa")), size(col("sb"))))
      .collect()(0)
    val (ni, nu, mn) = (row.getInt(row.fieldIndex("ni")),
      row.getInt(row.fieldIndex("nu")), row.getInt(row.fieldIndex("mn")))
    assert(ni * 10 >= mn * 9, "containment rule must fire")
    assert(ni * 10 < nu * 8, "Jaccard rule must NOT fire on this pair")
  }

  test("q_quality_logistic scores are probabilities and keep<=docs") {
    run("q_quality_logistic").collect().foreach { r =>
      val docs = r.getLong(r.fieldIndex("n_docs"))
      val keep = r.getLong(r.fieldIndex("n_keep"))
      val s = r.getDouble(r.fieldIndex("avg_score"))
      assert(keep >= 0 && keep <= docs)
      assert(s > 0.0 && s < 1.0, s"avg sigmoid out of range: $s")
    }
  }

  test("q_sessions_assemble conserves events; episodes match the cap") {
    val rows = run("q_sessions_assemble").collect()
    val total = T.t(spark, sfDir, "events").count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum
      === total, "sessionization lost or duplicated events")
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_events"))
      val steps = r.getString(r.fieldIndex("episode")).split(">").length
      assert(steps === math.min(n, 12L).toInt,
        s"episode has $steps steps for n_events=$n (cap 12)")
      assert(r.getLong(r.fieldIndex("dur_us")) >= 0L)
    }
    // Session ids are 1..k contiguous per user: ids and their count
    // agree on both endpoints.
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(rs.head.fieldIndex("session_id"))).sorted
      assert(ids.head === 1L && ids.last === ids.length.toLong,
        "session ids not contiguous from 1")
    }
  }

  test("q_sessions_assemble plans ONE hash exchange (user_id reused)") {
    // The lag window shuffles by user_id; the island sum, the
    // per-session row_number, and the session agg must all reuse that
    // partitioning (their keys are supersets of user_id). A second
    // hashpartitioning exchange means the reuse claim regressed.
    val p = run("q_sessions_assemble").queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected 1 hash exchange, plan has $n")
  }
}
