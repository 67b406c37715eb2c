package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query, one JSON line out.
  *
  * Harness notes (VERDICT r1 #6-#8, r2 advice): queries run in the STABLE
  * registry order (`SparkEntry.all`, a Seq — not an unordered Map); a
  * warm-up pass touches EVERY test table (parquet footer/IO first-touch)
  * plus one full query (codegen/catalog init); each query is timed
  * `iters` times and the MEDIAN reported (kills GC/AQE noise on trivial
  * inputs); failed queries are listed in `failed` and contribute NOTHING
  * to `queries` or `total`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        T.scratchDir("graft-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    // Warm-up (untimed): bring the fresh fork JVM to steady state before
    // anything is timed. `count()` on parquet is answered from footer
    // metadata (no data pages), so the table pass hashes every column of
    // every row and COLLECTS the hash — `head()`, not `count()`, because
    // count-on-top-of-aggregate lets ColumnPruning drop the inner
    // aggregate entirely (verified: empty ReadSchema), skipping the
    // column-chunk decode this pass exists to force (page cache +
    // parquet reader JIT). The fold is bit_xor, NOT sum: under Spark 4's
    // default ANSI mode, summing uniform-random 64-bit hashes overflows
    // LongType within a handful of rows, so a sum(xxhash64) pass aborts
    // on [ARITHMETIC_OVERFLOW] before decoding the table (seen in the
    // sf10 stderr; swallowed by the catch). XOR cannot overflow and
    // still requires every row's hash. Then a spread of representative queries
    // (join chain, windows, explode/regexp, array lambdas, decimal aggs,
    // set ops) runs once untimed: on a cold VM the first-timed queries
    // otherwise absorb the C2-compile/codegen storm and report 8-12×
    // (measured: q8_market_share 9.8 s cold vs 0.8 s steady on an
    // unchanged tree — JVM state, not plan).
    // Honest-materialization mode (SPARK_GRAFT_BENCH_FORCE=1): the
    // default `.count()` lets ColumnPruning DROP the aggregate
    // functions of a bare-aggregate result (count of groups needs only
    // the keys) — buffer-heavy aggregates (percentile, collect_*,
    // histogram, sketch UDAFs) never execute in that timed path. Force
    // mode hashes EVERY output cell instead (bit_xor of xxhash64(*),
    // overflow-proof like the table warm-up pass), so nothing above the
    // root can be pruned. Defined BEFORE the warm-up so every untimed
    // pass warms the SAME plan the timed loop will execute — a
    // count()-shaped warm-up in force mode left the hashed plan cold
    // and its first iteration carried the codegen/exchange first-touch
    // the mode exists to eliminate from the comparison.
    val force = sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      if (force) df.selectExpr("bit_xor(xxhash64(*)) as h").head()
      else df.count()
    T.star.foreach { n =>
      try T.t(spark, sfDir, n)
        .selectExpr("bit_xor(xxhash64(*)) as h").head()
      catch { case _: Throwable => () }
    }
    val warmQs = Set("q1_pricing_summary", "q8_market_share",
      "q_win_rank", "q_explode_words", "q_text_tokens", "q_except_all",
      "q_ann_cosine_topk", "q_agg_cube", "q_join_star", "q_sample_dsir")
    // Fail loud if a rename/removal silently drops a query out of the
    // warm-up set (filter(contains) alone would just skip it).
    val regNames = SparkEntry.all.map(_.name).toSet
    require(warmQs.subsetOf(regNames),
      s"warmQs names missing from registry: ${(warmQs -- regNames).toSeq.sorted.mkString(",")}")
    // SPARK_GRAFT_WARM_SPREAD=0 skips the representative-query spread
    // (NOT the table pass or the sacrificial first-query re-run below).
    // Exists for the dedicated-JVM scale protocol: at sf30 the ten
    // spread queries cost minutes per JVM, and a single-query isolation
    // run measuring a tens-of-seconds query doesn't need sub-second
    // codegen-warmth precision — its own untimed re-run warms the one
    // plan that will be timed. Bench-SF (sf0.1) runs keep the default.
    val warmSpread = !sys.env.get("SPARK_GRAFT_WARM_SPREAD").contains("0")
    if (warmSpread)
      SparkEntry.all.filter(d => warmQs.contains(d.name)).foreach { d =>
        try exec(d.run(spark, sfDir)) catch { case _: Throwable => () }
        T.releaseScratch(spark)
      }
    // Dev filter (same contract as Verify): SPARK_GRAFT_ONLY=q_a,q_b
    // times just those queries; unset (the driver) = all.
    // SPARK_GRAFT_REVERSE=1 times them in reverse registry order — the
    // scale-measurement protocol runs each set in both orders and takes
    // the per-query MIN, which controls for in-JVM state accumulation
    // (GC debris, shuffle-file page-cache pressure) that grows with
    // position at multi-GB SFs (measured ±4× position effects at sf10).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered0 = SparkEntry.all.filter(d => only.forall(_.contains(d.name)))
    val ordered = if (sys.env.get("SPARK_GRAFT_REVERSE").contains("1"))
      ordered0.reverse else ordered0

    // Sacrificial untimed re-run of the FIRST query that will be timed,
    // right before the timed loop: q1 is in warmQs, but nine other
    // warm-up queries run between its warm-up pass and its first timed
    // slot, and the r7 driver run still showed q1 at 2.38× while the
    // suite median ratio was 1.006 — residual first-slot JVM/allocator
    // state, not a plan issue. Re-running it as the LAST untimed action
    // absorbs it. Uses the filtered, possibly-reversed list so targeted
    // SPARK_GRAFT_ONLY dev runs warm the query they will actually time.
    ordered.headOption.foreach { d =>
      try exec(d.run(spark, sfDir)) catch { case _: Throwable => () }
      T.releaseScratch(spark)
    }
    // The driver always runs default mode; the frozen force-mode JSON
    // in BASELINE.md is the drift gate (scripts/drift_check.sh runs
    // force mode by default since round 11), and the default-mode
    // frozen JSON is kept for driver-run comparisons — see BASELINE.md
    // "count-pruning artifact".
    var failed = List.empty[String]
    val results = ordered
      .flatMap { d =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        val r =
          try { exec(d.run(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        // Per-ITERATION scratch release (untimed): each run() builds
        // fresh checkpoint blocks, so without this the 3 iterations
        // hold 3 copies and ~200 queries × iters accumulate — the
        // storage pressure inflated late-running queries 3-5× and fed
        // G1 concurrent-mark churn on large-heap (88 g) driver JVMs.
        T.releaseScratch(spark)
        r
      }
      if (times.isEmpty) { failed ::= d.name; None }
      else Some(d.name -> times.sorted.apply(times.size / 2))
    }
    val fs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum

    // Full per-query detail is too large for the driver's 2000-char stdout
    // tail (every BENCH_r1..r5 ended up `parsed: null` because the JSON
    // line was truncated mid-map). So: write the complete map to a file
    // next to this run, and keep the FINAL stdout line compact — total,
    // failure list, and only the slowest queries — so the tail always
    // contains one complete, parseable JSON object as its last line.
    def jnum(v: Double): String = f"$v%.3f"
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val forceTag = if (force) "\"force\":true," else ""
    val fullLine =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec",$forceTag"queries":$fullQs,"failed":$fs,"iters":$iters,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"), fullLine + "\n")
    catch { case _: Throwable => () }

    val slow = results.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec",$forceTag"queries":$slow,"n":${results.size},"failed":$fs,"iters":$iters,"sf":"$sfDir","detail":"BENCH_DETAIL.json"}"""
    println(line)
    // The driver parses the LAST stdout line as JSON. Stop Spark FIRST
    // (its shutdown may still log), then re-print the line as the final
    // act on both streams; build.sbt's StdoutOutput + showSuccess=false
    // keep sbt from prefixing it or appending a [success] trailer.
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.err.println(line)
  }
}
