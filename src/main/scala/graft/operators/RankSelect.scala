package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact rank/quantile selection over a SMALL fixed group
  * domain — the scale-safe replacement for Spark's exact
  * `percentile`/`median` aggregates (and Hive's UDAFPercentile, whose
  * semantics they match): those are TypedImperativeAggregates that
  * buffer EVERY value of a group in one aggregation buffer, so a
  * 3-group exact median over a 100 TB fact holds ~n/3 doubles in a
  * single task's memory — the same quiet scale killer as an
  * un-partitioned window, just spelled as an aggregate.
  *
  * The distributed shape instead exploits that an exact interpolated
  * quantile is a pure function of n_g and the values at TWO global
  * ranks per requested quantile: range-partition on (group, value),
  * sort within partitions (fully parallel — the same bytes any exact
  * per-group sort moves), collect the P×G per-partition per-group
  * count matrix (P = defaultParallelism, a cluster-bounded runtime
  * stat — the AQE/ConnectedComponents principle; G = |group domain|,
  * fixed by construction), convert to per-group offsets, and have each
  * partition emit only the boundary-rank values it owns. Driver-side
  * state is O(P·G + |qs|·G) — never corpus-sized.
  *
  * Interpolation reproduces Spark's Percentile.getPercentile
  * arithmetic exactly — position = (n-1)·q, then
  * (higher-position)·v_lo + (position-lower)·v_hi — so results are
  * bit-identical to the aggregates they replace (and therefore keep
  * the existing DuckDB-oracle agreement under the queries' round(4)).
  *
  * Values at a rank are partitioning-independent even with duplicate
  * values: the value at rank r of a sorted multiset does not depend on
  * how ties are ordered among themselves.
  *
  * DETERMINISTIC-INPUT REQUIREMENT (ADVICE r14): the checkpoint-free
  * two-pass protocol relies on pass 2 reusing pass 1's shuffle map
  * outputs (skipped stage). If map outputs are LOST and recomputed
  * between the passes from a NON-deterministic source (e.g. a sampled
  * or rand()-derived input), the count matrix can silently disagree
  * with pass 2's partition contents — wrong quantiles with no error,
  * where the old localCheckpoint variant failed loudly. Callers
  * (q_agg_percentile / q_agg_median_mad / q_agg_equidepth and any
  * future user) must feed deterministic frames: scans, projections and
  * joins of the test tables qualify; anything seeded by rand() or
  * current-time does not.
  */
object RankSelect {

  /** Below this estimated input size the buffering percentile
    * aggregate is used instead of rank selection — SIZE-ADAPTIVE like
    * ConnectedComponents' union-find cutover. The estimate is the
    * optimizer's free sizeInBytes statistic (no extra job); a wrong-
    * side decision only changes the PLAN, never the result, because
    * both paths compute the identical interpolation arithmetic — so an
    * estimation error costs speed, not correctness (the AQE principle:
    * pick physical strategy from runtime stats). 1 GiB of estimated
    * (column-pruned, compressed) input ≈ hundreds of millions of
    * values of per-group count-map state — past what one task's
    * aggregation buffer should hold. Local SFs land on the aggregate
    * path (sf10's pruned 2-column estimate is ~160 MB); a 100 TB fact
    * is orders of magnitude above the line. The distributed path is
    * held correct by Round9OpsSpec's forced bit-equivalence test, so
    * the cutover engaging at cluster scale is a plan change only.
    */
  val aggregateSafeBytes: Long = 1L << 30

  /** Fail-loud ceiling on driver-held count-matrix entries (≤ P·G).
    * The distributed path's driver state is O(P·G); the contract is a
    * SMALL fixed group domain, so with P ≈ thousands of cores this cap
    * (4M tiny tuples, a few hundred MB worst case) is never approached
    * by a legitimate caller — a future caller grouping by a high-
    * cardinality key hits a clear error here instead of quietly
    * OOMing the driver mid-collect.
    */
  val maxCountMatrixEntries: Int = 1 << 22

  /** Partition count for the range-partitioned sorts: scales with the
    * input's optimizer size estimate (~64 MiB of estimated input per
    * partition) instead of inheriting the session's FIXED
    * shuffle-partition count — at 600M rows (sf100) a fixed 32 put
    * ~19M values into one task's sort buffers and OOM'd a 40g
    * single-JVM harness (the fourth-decade crack; SCALE.md round-15).
    * Another scale-with-n parameter that must not sit at a constant.
    * Bounded below by defaultParallelism, so bench-SF plans (estimate
    * under 2 GiB) are byte-identical to before; bounded above by a
    * sanity cap. On a real cluster the larger count is also the
    * correct posture — AQE coalesces any excess back, and the P×G
    * driver matrix stays under its fail-loud cap (P ≤ 4096).
    */
  private[graft] def rangeParts(s: org.apache.spark.sql.SparkSession,
      estBytes: BigInt): Int = {
    val byBytes = (estBytes / (64L << 20)).min(BigInt(4096)).toInt
    math.max(math.max(1, s.sparkContext.defaultParallelism), byBytes)
  }

  /** Per-group exact linear-interpolated quantiles.
    *
    * @param df       input frame
    * @param groupCol string-typed grouping column over a fixed domain
    * @param valueCol numeric column (cast to double)
    * @param qs       quantile fractions in [0, 1]
    * @param safeBytes cutover threshold (overridable so tests can force
    *                  the distributed path on small fixtures)
    * @return group -> (n_g, interpolated values aligned with qs)
    */
  def groupedQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      safeBytes: Long = aggregateSafeBytes,
      matrixCap: Int = maxCountMatrixEntries): Map[String, (Long, Array[Double])] = {
    val s = df.sparkSession
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Null discipline: Spark's percentile aggregate silently skips null
    // values, so the distributed path must see the SAME multiset — and
    // n must count the same rows on both paths. Filter once, up front,
    // so a null-bearing input cannot make the size-adaptive cutover
    // change results (or NPE on a boundary rank landing on a null).
    val nn = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    if (estBytes <= safeBytes) {
      // Small path: Spark's exact percentile aggregate with the ARRAY
      // of fractions — ONE aggregation buffer (one value→count
      // OpenHashMap, one sort) shared by every requested quantile.
      // Measured 2.5-3× faster than one percentile(v, q) aggregate per
      // fraction (each of those builds and sorts its own copy of the
      // identical per-group count map): 4 quantiles over sf0.1
      // lineitem 4.0 s → 1.3 s. Same Percentile.getPercentile
      // arithmetic, so still bit-identical to the distributed path.
      return nn.groupBy("g")
        .agg(percentile(col("v"), array(qs.map(lit): _*)).as("qv"),
          count(lit(1)).as("n"))
        .collect()
        .map { r =>
          r.getString(0) -> ((r.getLong(2),
            r.getSeq[Double](1).toArray))
        }.toMap
    }
    val p = rangeParts(s, estBytes)
    // ONE shuffle, ONE sort, NO materialization. The former protocol
    // eagerly localCheckpointed the range-SORTED corpus to give the
    // two passes a consistent partitioning — corpus-sized block
    // storage (the house rule violation) and truncated lineage (a
    // lost executor kills the query instead of recomputing). The
    // consistency actually comes free from Spark's shuffle-stage
    // reuse: the range exchange below is a single ShuffleDependency
    // on this one RDD instance, its map outputs are produced by
    // pass 1's job and the DAGScheduler skips the completed map stage
    // in pass 2's job — both passes read the SAME shuffle files,
    // identical partitioning by construction, full lineage intact.
    // And the per-partition SORT belongs only to pass 2: the count
    // matrix is order-free, so pass 1 counts straight off the
    // un-sorted shuffle read (a sorted-both-passes variant measured
    // 2× the sort cost at sf100 — 217 s vs this shape; the old
    // checkpointed one, 305 s). Pass 2 wraps the same RDD instance
    // back into a DataFrame and sorts WITHIN partitions — no
    // exchange, partition indices preserved one-to-one, so pass 1's
    // offsets address pass 2's partitions directly. Tie order among
    // equal (g, v) rows is partitioning-independent for the result
    // (the scaladoc invariant above).
    val shuffled = nn.repartitionByRange(p, col("g"), col("v"))
    val shuffledRdd = shuffled.rdd
    // Pass 1: P×G count matrix (bounded by cluster × domain).
    val counts: Array[(Int, String, Long)] = shuffledRdd
      .mapPartitionsWithIndex { (i, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { r =>
            val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1L
          }
          m.iterator.map { case (g, c) => (i, g, c) }
        }.collect()
    require(counts.length <= matrixCap,
      s"RankSelect: P×G count matrix has ${counts.length} entries " +
        s"(cap $matrixCap) — the group domain is not the " +
        "SMALL fixed domain this operator requires; use a mergeable " +
        "sketch (KllSketch) for high-cardinality grouping instead")
    val nByG: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
    // 0-based fractional positions per group (Spark's (n-1)*q).
    val posByG: Map[String, Array[Double]] = nByG.map { case (g, n) =>
      g -> qs.map(q => (n - 1).toDouble * q).toArray
    }
    val wantedByG: Map[String, Array[Long]] = posByG.map { case (g, ps) =>
      g -> ps.flatMap(pos =>
        Seq(math.floor(pos).toLong + 1L, math.ceil(pos).toLong + 1L))
        .distinct.sorted
    }
    // Exclusive per-group offsets per partition, in partition order.
    val offByPidG = scala.collection.mutable.Map.empty[(Int, String), Long]
    val running = scala.collection.mutable.Map.empty[String, Long]
    counts.sortBy(_._1).foreach { case (pid, g, c) =>
      offByPidG((pid, g)) = running.getOrElse(g, 0L)
      running(g) = running.getOrElse(g, 0L) + c
    }
    val offB = offByPidG.toMap
    val cntB = counts.map { case (pid, g, c) => (pid, g) -> c }.toMap
    // Pass 2: each partition emits only the boundary-rank values it
    // owns (≤ 2·|qs| rows per group suite-wide). The same RDD
    // instance rides under a no-exchange local sort: the range
    // shuffle's map stage is skipped, and this is the protocol's ONLY
    // sort of the corpus.
    val picked: Map[(String, Long), Double] = s
      .createDataFrame(shuffledRdd, shuffled.schema)
      .sortWithinPartitions("g", "v")
      .rdd
      .mapPartitionsWithIndex { (i, it) =>
        val out = Array.newBuilder[((String, Long), Double)]
        var curG: String = null
        var local = 0L
        var goff = 0L
        var targets: Array[Long] = Array.emptyLongArray
        var ti = 0
        it.foreach { r =>
          val g = r.getString(0)
          if (g != curG) {
            curG = g; local = 0L
            goff = offB.getOrElse((i, g), 0L)
            val cnt = cntB.getOrElse((i, g), 0L)
            targets = wantedByG.getOrElse(g, Array.emptyLongArray)
              .filter(t => t > goff && t <= goff + cnt)
            ti = 0
          }
          local += 1L
          if (ti < targets.length && goff + local == targets(ti)) {
            out += (((g, targets(ti)), r.getDouble(1))); ti += 1
          }
        }
        out.result().iterator
      }.collect().toMap
    nByG.map { case (g, n) =>
      val vals = posByG(g).map { pos =>
        val lower = math.floor(pos).toLong
        val higher = math.ceil(pos).toLong
        val vLo = picked((g, lower + 1L))
        if (higher == lower) vLo
        else {
          val vHi = picked((g, higher + 1L))
          // Spark Percentile.getPercentile arithmetic, verbatim.
          (higher - pos) * vLo + (pos - lower) * vHi
        }
      }
      g -> ((n, vals))
    }
  }

  /** Per-group exact KEY TUPLES at caller-chosen ranks — the same
    * range-partition / count-matrix / boundary-emission engine as
    * [[groupedQuantiles]], generalized from "value at rank" to "sort
    * key at rank" over a two-part (k1, k2) lexicographic key. This is
    * what an exact rank-BUCKETING operator needs (e.g. per-language
    * percent_rank deciles): fetch only the first row of each bucket,
    * broadcast those O(groups × buckets) tuples, and classify the
    * corpus by comparison — no per-group total sort, no un-partitioned
    * window, no corpus-sized driver state.
    *
    * @param df       frame whose FIRST THREE columns are
    *                 (group: string, k1: long, k2: long); (k1, k2) must
    *                 be a unique total order within each group (the
    *                 caller tie-breaks, as percent_rank callers already
    *                 do) and non-null.
    * @param ranksOf  1-based ranks wanted for a group of size n
    *                 (ascending, each in [1, n])
    * @return group -> (n_g, rank -> (k1, k2))
    */
  def groupedKeysAtRanks(
      df: DataFrame,
      ranksOf: Long => Array[Long],
      matrixCap: Int = maxCountMatrixEntries): Map[String, (Long, Map[Long, (Long, Long)])] = {
    val s = df.sparkSession
    val Seq(gc, c1, c2) = df.columns.take(3).toSeq
    val p = rangeParts(s, df.queryExecution.optimizedPlan.stats.sizeInBytes)
    // Checkpoint-free two-pass protocol: one range shuffle whose map
    // outputs pass 2 reuses (skipped stage), counting off the
    // un-sorted read, sorting only in pass 2 — see the
    // groupedQuantiles note. Here even tie order is a non-issue:
    // (k1, k2) is a unique total order within each group by contract.
    val shuffled = df
      .select(col(gc).cast("string").as("g"),
        col(c1).cast("long").as("k1"), col(c2).cast("long").as("k2"))
      .repartitionByRange(p, col("g"), col("k1"), col("k2"))
    val shuffledRdd = shuffled.rdd
    val counts: Array[(Int, String, Long)] = shuffledRdd
      .mapPartitionsWithIndex { (i, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = r.getString(0); m(g) = m.getOrElse(g, 0L) + 1L
        }
        m.iterator.map { case (g, c) => (i, g, c) }
      }.collect()
    require(counts.length <= matrixCap,
      s"RankSelect: P×G count matrix has ${counts.length} entries " +
        s"(cap $matrixCap) — group domain too large")
    val nByG: Map[String, Long] =
      counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
    val wantedByG: Map[String, Array[Long]] = nByG.map { case (g, n) =>
      val rs = ranksOf(n)
      require(rs.forall(r => r >= 1L && r <= n),
        s"groupedKeysAtRanks: rank out of [1, $n] for group $g")
      g -> rs.distinct.sorted
    }
    val offByPidG = scala.collection.mutable.Map.empty[(Int, String), Long]
    val running = scala.collection.mutable.Map.empty[String, Long]
    counts.sortBy(_._1).foreach { case (pid, g, c) =>
      offByPidG((pid, g)) = running.getOrElse(g, 0L)
      running(g) = running.getOrElse(g, 0L) + c
    }
    val offB = offByPidG.toMap
    val cntB = counts.map { case (pid, g, c) => (pid, g) -> c }.toMap
    val picked: Map[(String, Long), (Long, Long)] = s
      .createDataFrame(shuffledRdd, shuffled.schema)
      .sortWithinPartitions("g", "k1", "k2")
      .rdd
      .mapPartitionsWithIndex { (i, it) =>
        val out = Array.newBuilder[((String, Long), (Long, Long))]
        var curG: String = null
        var local = 0L
        var goff = 0L
        var targets: Array[Long] = Array.emptyLongArray
        var ti = 0
        it.foreach { r =>
          val g = r.getString(0)
          if (g != curG) {
            curG = g; local = 0L
            goff = offB.getOrElse((i, g), 0L)
            val cnt = cntB.getOrElse((i, g), 0L)
            targets = wantedByG.getOrElse(g, Array.emptyLongArray)
              .filter(t => t > goff && t <= goff + cnt)
            ti = 0
          }
          local += 1L
          if (ti < targets.length && goff + local == targets(ti)) {
            out += (((g, targets(ti)), (r.getLong(1), r.getLong(2))))
            ti += 1
          }
        }
        out.result().iterator
      }.collect().toMap
    nByG.map { case (g, n) =>
      g -> ((n, wantedByG(g).map(r => r -> picked((g, r))).toMap))
    }
  }
}
