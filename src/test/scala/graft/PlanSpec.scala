package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the scale-critical physical-plan properties
  * the query comments claim (broadcast dims, pushed filters, bucketed
  * no-Exchange SMB, top-N pushdown, partition pruning) are enforced
  * here, so a regression that silently degrades the 100 TB plan fails
  * the suite even though results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestBase._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q_join_star broadcasts dims and pushes the date filter to scan") {
    val p = plan("q_join_star")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate") || p.contains("o_orderdate"),
      "orders date filter not pushed to the parquet scan")
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "shipdate filter not pushed")
    assert(p.contains("HashAggregate"), "no hash aggregation")
  }

  test("q_join_bucketed_smb joins without an exchange") {
    val p = plan("q_join_bucketed_smb")
    assert(p.contains("SortMergeJoin"), "not a sort-merge join")
    // The join inputs are bucketed on the key: no shuffle may sit
    // between the scans and the join. (The final groupBy/orderBy may
    // exchange — cut the plan at the join.)
    val joinIdx = p.indexOf("SortMergeJoin")
    val belowJoin = p.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles its inputs")
  }

  test("q_sort_topn plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q_sort_topn")
    assert(p.contains("TakeOrderedAndProject"), "top-N not pushed down")
  }

  test("q_sample_weighted is a scan + distributed top-k (no shuffle, no sort)") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      "weighted sample top-k not pushed down")
    assert(!p.contains("Exchange hashpartitioning"),
      s"weighted sampling shuffled the corpus:\n$p")
  }

  test("q_sink_partitioned read prunes partitions") {
    val p = plan("q_sink_partitioned")
    assert(p.contains("PartitionFilters") &&
      p.contains("o_orderstatus"), "status filter not a partition filter")
  }

  test("near-dup and ANN pipelines never plan a cartesian product") {
    // The bucket-confined-quadratic claim, enforced: candidate
    // generation must be equi-joins on (band, hash) / (table, bucket),
    // never an all-pairs nested loop.
    for (name <- Seq("q_dedup_minhash", "q_dedup_simhash",
        "q_ann_lsh_bucketed")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
      // The ANN query legitimately broadcast-crosses each vector with
      // the 60-row hyperplane relation; only the text near-dup paths
      // must be loop-free end to end.
      if (name != "q_ann_lsh_bucketed")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested loop")
    }
  }

  test("q_join_asof runs as one windowed pass, no self-join") {
    // The as-of rewrite's whole point: no join operator at all —
    // union-tag + prefix window, a single sort-based pass per user.
    val p = plan("q_join_asof")
    assert(!p.contains("Join"), s"as-of planned a join:\n$p")
    assert(p.contains("Window"), "as-of lost its window")
  }

  test("q_join_range_binned joins equi on bucket, not nested-loop") {
    // The binned range join must plan a HASH join on the bucket key;
    // the raw range predicate alone would nested-loop.
    val p = plan("q_join_range_binned")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a loop join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"range join is not an equi join on the bucket:\n$p")
  }

  test("q_stream_join plans an equi join on user_id, not a loop join") {
    // The 30-minute bound must ride as a post-join filter on a hash/SMJ
    // equi join — a nested loop over clicks × purchases would be the
    // 100 TB failure mode.
    val p = plan("q_stream_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"stream-join batch twin fell back to a loop join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"stream-join batch twin is not an equi join:\n$p")
  }

  test("q_profile_columns profiles every column in ONE scan") {
    // The profiler's point: 5 columns × 5 metrics from a single pass
    // (multi-countDistinct Expand), not a scan per column.
    val p = plan("q_profile_columns")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
    assert(p.contains("Expand"), "multi-distinct Expand missing")
  }

  test("correlated subqueries decorrelate to joins (no per-row re-execution)") {
    for (name <- Seq("q_subq_scalar", "q_subq_exists_corr")) {
      val p = plan(name)
      assert(p.contains("Join"), s"$name has no join after decorrelation")
      assert(!p.contains("ScalarSubquery"),
        s"$name still evaluates a scalar subquery per row")
    }
  }

  test("projection pruning reaches the scan (narrow ReadSchema)") {
    val p = plan("q_sort_topn")
    // The 3-column projection must prune the 9-column orders schema.
    assert(p.contains("ReadSchema"))
    assert(!p.contains("o_orderdate"), "unused columns read from parquet")
  }

  test("q_decontam_ngram probes eval grams map-side (broadcast semi)") {
    // The eval/benchmark side is tiny by construction; the corpus-sized
    // train gram stream must NEVER shuffle for the contamination probe.
    val p = plan("q_decontam_ngram")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "eval gram set not broadcast-semi-joined")
    assert(!p.contains("SortMergeJoin LeftSemi".substring(0, 13)) ||
      !p.contains("SortMergeJoin"), "contamination probe shuffles the corpus")
  }

  test("q_text_surprisal probes the vocab map-side (broadcast hash join)") {
    // The unigram vocab is Zipf-bounded; the corpus token stream must
    // hash-probe it map-side, never shuffle for the join.
    val p = plan("q_text_surprisal")
    assert(p.contains("BroadcastHashJoin"), "vocab not broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"surprisal shuffles the token stream for the vocab join:\n$p")
  }

  test("q_text_pmi joins unigram counts map-side, no cartesian") {
    val p = plan("q_text_pmi")
    assert(p.contains("BroadcastHashJoin"), "unigram lookups not broadcast")
    assert(!p.contains("CartesianProduct"), "PMI plans a cartesian")
  }

  test("q_decontam_substring broadcasts snippets, streams the corpus") {
    // A contains-join has no equi key: the only scale-correct plan is a
    // broadcast nested loop with the TINY snippet side broadcast — the
    // corpus side must stream with no shuffle at all before the agg.
    val p = plan("q_decontam_substring")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"substring probe is not a broadcast loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      "substring probe degenerated to a non-broadcast cartesian")
  }

  test("q_chunk_stride fans out per-row with no join and no hash shuffle") {
    // Chunking is a pure per-row sequence+explode: the only exchange
    // allowed is the final demo sort (range partitioning).
    val p = plan("q_chunk_stride")
    assert(!p.contains("Join"), s"chunking plans a join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking hash-shuffles the corpus:\n$p")
  }

  test("q_pii_redact is a pure per-row projection (no join, one scan)") {
    val p = plan("q_pii_redact")
    assert(!p.contains("Join"), s"PII scrub plans a join:\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans")
  }

  test("q_curriculum_bins bins via broadcast cuts, not a global window") {
    // The quartile cut points ride a broadcast 1-row relation; a global
    // ntile window (single-task sort of the corpus) must never appear.
    val p = plan("q_curriculum_bins")
    assert(!p.contains("Window"), s"curriculum binning plans a window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"cut-point join shuffles the corpus:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "cut points not broadcast")
  }

  test("q_sample_stratified is a pure filter before the accounting agg") {
    // Deterministic hash sampling must not shuffle the corpus: the only
    // exchange allowed is the low-cardinality accounting groupBy.
    val p = plan("q_sample_stratified")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      "sampling plans a join")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p).size
    assert(exchanges <= 1, s"sampling shuffles $exchanges times")
  }

  test("q5 broadcasts the dim chain and pushes the date filter") {
    val p = plan("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), "nation/region not broadcast")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      "order-date filter not pushed to the parquet scan")
    assert(!p.contains("CartesianProduct"),
      "join reorder produced a cartesian")
  }

  test("k-means assignment broadcasts centroids (corpus never shuffles)") {
    // Every assignment pass must be corpus × broadcast(k centroids):
    // a SortMergeJoin here would shuffle the full corpus per Lloyd
    // round — the exact failure mode the query comment rules out.
    val p = plan("q_cluster_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "centroids not broadcast into the assignment pass")
    assert(!p.contains("SortMergeJoin"),
      s"k-means shuffles the corpus for assignment:\n$p")
  }

  test("semdedup pair join is equi on the cell id, never cartesian") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"),
      s"semdedup plans an all-pairs cartesian:\n$p")
    assert(p.contains("hashpartitioning(cid") ||
      p.contains("BroadcastHashJoin"),
      "in-cell pair join is not an equi join on cid")
  }

  test("inverted index reuses the token shuffle for window + groupBy") {
    // The window (partitionBy token) and the final groupBy(token) share
    // a key: exactly ONE hashpartitioning exchange on token may appear.
    val p = plan("q_text_inverted_index")
    val tokenExchanges = "Exchange hashpartitioning\\(token".r
      .findAllIn(p).size
    assert(tokenExchanges == 1,
      s"expected 1 token exchange, saw $tokenExchanges:\n$p")
  }

  test("q6 is a pure scan-agg: all three predicates pushed, no join") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate") &&
      p.contains("l_discount") && p.contains("l_quantity"),
      s"not every q6 predicate reached the parquet scan:\n$p")
    assert(!p.contains("Join"), "q6 must not join anything")
    assert(p.contains("HashAggregate"), "no hash aggregation")
  }

  test("q4 decorrelates EXISTS to one semi join, no cartesian") {
    val p = plan("q4_order_priority")
    assert(p.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q4 planned a non-equi product:\n$p")
  }

  test("q2 min-cost probe is one window over broadcast-pruned supply") {
    val p = plan("q2_min_cost_supplier")
    assert(p.contains("Window"), "min-cost not decorrelated to a window")
    assert(p.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!p.contains("CartesianProduct"), "q2 planned a cartesian")
    // The part filter must prune BEFORE the window's partkey shuffle:
    // no second aggregation pass over unfiltered supply.
    val windows = "Window".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly one window, saw $windows")
  }

  test("q9 broadcasts the part-name probe and pushes the LIKE prefix") {
    val p = plan("q9_product_type_profit")
    assert(p.contains("BroadcastHashJoin"), "part probe not broadcast")
    assert(p.contains("StringStartsWith") || p.contains("p_name"),
      "p_name LIKE prefix not pushed to the part scan")
    assert(!p.contains("CartesianProduct"), "q9 planned a cartesian")
  }

  test("q16 excludes blacklisted suppliers via broadcast anti join") {
    val p = plan("q16_supplier_part_count")
    assert(p.contains("LeftAnti"), "NOT IN did not become an anti join")
    assert(p.contains("BroadcastHashJoin"), "part/blacklist not broadcast")
  }

  test("q20 folds both quantity sums into one aggregation pass") {
    val p = plan("q20_part_promotion")
    assert(p.contains("LeftSemi"), "part probe not a semi join")
    // q96 and qall must share one HashAggregate pair (partial+final),
    // not two separate scans of lineitem.
    val scans = "FileScan parquet".r.findAllIn(p).size +
      "Scan parquet".r.findAllIn(p).size
    assert(scans <= 6, s"q20 re-scans its inputs ($scans scans):\n$p")
  }

  test("q_sketch_quantiles shuffles sketch blobs, not raw values") {
    val p = plan("q_sketch_quantiles")
    // Two-stage shape: partial kll_sketch_agg per (pri, shard) map-side,
    // then a second aggregate unioning blobs — the per-row o_totalprice
    // must not cross an exchange (only pri/shard + binary sketch do).
    assert(p.contains("kll_sketch_agg") && p.contains("kll_union_agg"),
      "two-stage sketch aggregation missing")
    val firstEx = p.indexOf("Exchange")
    assert(firstEx >= 0, "expected a shuffle between sketch stages")
    assert(!p.substring(0, firstEx).contains("o_totalprice") ||
      p.substring(0, firstEx).contains("ObjectHashAggregate"),
      "raw o_totalprice shuffled instead of sketch blobs")
  }

  test("q_ann_jl_rerank broadcasts queries and never re-scans the corpus wide") {
    val p = plan("q_ann_jl_rerank")
    // The coarse stage must join the 5 broadcast query rows against the
    // projected corpus (a broadcast join, not a shuffled cartesian of
    // the corpus against itself).
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), "query side not broadcast")
    assert(!p.contains("CartesianProduct"),
      "coarse stage planned a corpus cartesian")
  }

  test("q_win_topk_per_group pushes the rank limit below the shuffle " +
    "(TopNKeyOperator [Hive3+] twin)") {
    // Hive 3's TopNKeyOperator drops per-key rows beyond the top-N
    // BEFORE the ReduceSink so only N rows per key ever shuffle; Spark's
    // InferWindowGroupLimit is the same optimization — the rn <= 3
    // filter over row_number becomes a WindowGroupLimit pair (Partial
    // before the exchange, Final after). At 100 TB this is the
    // difference between shuffling 3 rows and the full history per key.
    val p = plan("q_win_topk_per_group")
    val first = p.indexOf("WindowGroupLimit")
    assert(first >= 0, "rank-limit pushdown (WindowGroupLimit) missing")
    assert(p.indexOf("WindowGroupLimit", first + 1) > 0,
      "expected BOTH Partial (map-side) and Final group-limit passes")
  }
}
