package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 invariants:
  *
  * 1. RankSelect.rangeParts must SCALE with the input estimate — the
  *    twice-seen bug class (SemDeDup's constant k, RankSelect's
  *    constant partition count; both found by decade jumps) made a
  *    constant where a corpus-scaled parameter belongs. This spec
  *    fails if anyone re-constants it: below ~2 GiB the floor is
  *    defaultParallelism (bench-SF plans byte-identical), above it the
  *    count tracks ~64 MiB/partition, with a 4096 sanity ceiling.
  *
  * 2. The SemDeDup routed assignment in its MULTI-coarse regime
  *    (k > 64 → several coarse cells, wc=2 probing actually prunes
  *    candidates — the sf30 shape) must match an independent
  *    driver-side replay of the DuckDB oracle's CTE chain
  *    (c0/co/f2c/vprobe/cells with its exact tie-breaks). The
  *    Round15OpsSpec equivalence tests only reach k ≤ 8 — ONE coarse
  *    cell — where routing is trivially exhaustive; here 3 coarse
  *    cells exist and every vector's candidate set genuinely excludes
  *    one of them, so the f2c plumbing, wc=2 probe ranking and
  *    (d, cid)/(d, co_id) tie-breaks are all load-bearing.
  */
class Round16OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("rangeParts floors at defaultParallelism and scales ~64MiB/partition") {
    val s = spark
    val dp = math.max(1, s.sparkContext.defaultParallelism)
    // below the floor: bench-SF estimates (well under 2 GiB) keep the
    // session's parallelism — plans byte-identical to the pre-fix shape
    assert(operators.RankSelect.rangeParts(s, BigInt(0)) === dp)
    assert(operators.RankSelect.rangeParts(s, BigInt(160L << 20)) === dp)
    // above it: ~64 MiB of estimated input per partition
    assert(operators.RankSelect.rangeParts(s, BigInt(100L) << 30)
      === math.max(dp, 1600))
    assert(operators.RankSelect.rangeParts(s, BigInt(640L) << 20)
      === math.max(dp, 10))
    // sanity ceiling: a petabyte estimate cannot blow the P×G driver
    // matrix past its fail-loud cap
    assert(operators.RankSelect.rangeParts(s, BigInt(1L) << 50) === 4096)
  }

  /** Driver-side replay of the oracle's routed CTE chain over the
    * quantized vectors: c0 (fine seeds = vec_id < k), co (every 64th
    * seed), f2c (fine → coarse argmin, ties by co_id), vprobe (wc=2
    * nearest coarse, ties by co_id), cells (argmin over the probed
    * cells' fine centroids, ties by cid). Pure integer math — exact,
    * like both engines.
    */
  private def replayAssignment(
      vecs: Array[(Long, Array[Long])], k: Long): Map[Long, Long] = {
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val fine = vecs.filter(_._1 < k).sortBy(_._1)
    val coarse = fine.filter(_._1 % 64 == 0)
    assert(coarse.length >= 3, s"need a multi-coarse regime, got ${coarse.length}")
    // f2c: owning coarse per fine centroid
    val f2c: Map[Long, Long] = fine.map { case (cid, c) =>
      cid -> coarse.map { case (coId, cc) => (d2(c, cc), coId) }.min._2
    }.toMap
    val fineByCo: Map[Long, Array[(Long, Array[Long])]] =
      fine.groupBy(f => f2c(f._1))
    vecs.map { case (vid, q) =>
      val probed = coarse.map { case (coId, cc) => (d2(q, cc), coId) }
        .sorted.take(2).map(_._2)
      val cands = probed.flatMap(co => fineByCo.getOrElse(co, Array.empty))
      vid -> cands.map { case (cid, c) => (d2(q, c), cid) }.min._2
    }.toMap
  }

  test("routed SemDeDup assignment matches the oracle replay with 3 coarse cells") {
    val s = spark
    import s.implicits._
    SparkEntry.tune(s)
    // 162,500 vectors → k = 130 fine centroids → coarse seeds
    // {0, 64, 128}: three coarse cells, wc=2 probing drops one of them
    // for EVERY vector — the regime sf30 runs in (k ~ 1200).
    val n = 162500L
    val dir = SparkTestBase.tmpDir("graft-semded-multicoarse").toString
    (0L until n).toDF("vec_id")
      .withColumn("label", concat(lit("l"), pmod(col("vec_id"), lit(5))))
      .withColumn("embedding",
        expr("transform(sequence(1, 64), i -> cast(" +
          "(pmod(vec_id * 31 + i * 7, 2000) - 1000) / 1000.0 as float))"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = math.max(4L, n / 1250L)
    assert(k === 130L)
    // shared quantization (the q = round(x*1000) CTE) — the replay
    // tests the ROUTING, not float rounding, so both sides read q
    // identically
    val vecs = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> " +
        "cast(round(cast(x as double) * 1000) as bigint))").as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val want = replayAssignment(vecs, k)
    val got = queries.Similarity.semDedupCells(s, dir)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    val diffs = want.iterator.filter { case (v, c) => got(v) != c }.take(5).toSeq
    assert(diffs.isEmpty, s"assignment diverges from oracle replay: $diffs")
  }
}
