package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 invariants for the product-quantization ANN
  * (q_ann_pq_adc): the DataFrame pipeline's encode/LUT/ADC/rerank is
  * recomputed by an independent scalar-Scala implementation (plain
  * loops over the raw embeddings — no Spark expressions shared with
  * the query) and compared row-for-row; plus the PQ laws the oracle
  * hash can't articulate (ADC = Σ of per-subspace minima is a lower
  * bound of nothing in general, but it IS exact when a vector's
  * subvectors coincide with codebook entries — proven on the seed
  * vectors themselves).
  */
class Round12OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private val M = 8 // subspaces
  private val DSUB = 8 // dims per subspace
  private val K = 4 // centroids per subspace

  /** Quantized embeddings keyed by vec_id, from the raw floats. */
  private lazy val qemb: Map[Long, Array[Long]] =
    T.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Float]](1)
          .map(x => math.round(x.toDouble * 1000)).toArray
        (r.getLong(0), v)
      }.toMap

  private def subL2(a: Array[Long], aOff: Int, b: Array[Long], bOff: Int,
      n: Int): Long = {
    var d = 0L
    var i = 0
    while (i < n) {
      val t = a(aOff + i) - b(bOff + i)
      d += t * t
      i += 1
    }
    d
  }

  /** Scalar PQ: encode one vector against the codebook (seed vectors
    * 0..3), ties to the lowest centroid id.
    */
  private def encode(v: Array[Long]): Array[Int] =
    Array.tabulate(M) { s =>
      (0 until K).minBy(j => (subL2(v, s * DSUB, qemb(j.toLong), s * DSUB,
        DSUB), j))
    }

  private def adc(qq: Array[Long], codes: Array[Int]): Long =
    (0 until M).map(s =>
      subL2(qq, s * DSUB, qemb(codes(s).toLong), s * DSUB, DSUB)).sum

  test("q_ann_pq_adc matches an independent scalar recompute") {
    val rows = SparkEntry.queries("q_ann_pq_adc")(spark, sfDir).collect()
    assert(rows.length === 25, "5 queries x top-5")
    // recompute every corpus candidate's ADC + exact dist per query,
    // take top-5 by (adc, id) — must equal the query's output exactly.
    val corpus = qemb.keys.filter(_ >= 9).toSeq.sorted
    val codes = corpus.map(id => id -> encode(qemb(id))).toMap
    val expected = (4L until 9L).flatMap { qId =>
      val qq = qemb(qId)
      corpus.map(id => (id, adc(qq, codes(id))))
        .sortBy { case (id, d) => (d, id) }
        .take(5).zipWithIndex
        .map { case ((id, d), i) =>
          (qId, i + 1, id, d, subL2(qq, 0, qemb(id), 0, 64))
        }
    }
    val got = rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected, "PQ pipeline diverges from scalar recompute")
  }

  test("PQ is exact on codebook members (self-coding law)") {
    // A seed vector's subvectors ARE codebook entries, so its code in
    // each subspace selects itself (distance 0, lowest id among ties
    // only if another seed duplicates the subvector) and the ADC
    // distance from any query equals the true distance to the DECODED
    // reconstruction — for the seed itself, Σ LUT[s, code_s] with
    // code_s = seed must give subL2 = 0 against itself.
    for (seed <- 0 until K) {
      val v = qemb(seed.toLong)
      val c = encode(v)
      assert(adc(v, c) === 0L, s"seed $seed must self-code at distance 0")
    }
  }

  test("q_ann_ivfpq matches an independent scalar recompute") {
    val rows = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir).collect()
    assert(rows.length === 25, "5 queries x top-5")
    val corpus = qemb.keys.filter(_ >= 9).toSeq.sorted
    // coarse assignment + residuals
    def assignCell(v: Array[Long]): Int =
      (0 until 4).minBy(cid => (subL2(v, 0, qemb(cid.toLong), 0, 64), cid))
    def residual(v: Array[Long], cid: Int): Array[Long] =
      Array.tabulate(64)(i => v(i) - qemb(cid.toLong)(i))
    val cellOf = corpus.map(id => id -> assignCell(qemb(id))).toMap
    val resOf = corpus.map(id =>
      id -> residual(qemb(id), cellOf(id))).toMap
    // shared residual codebook = residuals of vectors 9..12
    val cb = (0 until 4).map(j => resOf(9L + j)).toArray
    def encodeRes(r: Array[Long]): Array[Int] =
      Array.tabulate(M) { s =>
        (0 until K).minBy(j => (subL2(r, s * DSUB, cb(j), s * DSUB, DSUB), j))
      }
    val codesOf = corpus.map(id => id -> encodeRes(resOf(id))).toMap
    val expected = (4L until 9L).flatMap { qId =>
      val qq = qemb(qId)
      val probed = (0 until 4)
        .sortBy(cid => (subL2(qq, 0, qemb(cid.toLong), 0, 64), cid))
        .take(2).toSet
      corpus.filter(id => probed.contains(cellOf(id)))
        .map { id =>
          val qr = residual(qq, cellOf(id))
          val adcD = (0 until M).map(s =>
            subL2(qr, s * DSUB, cb(codesOf(id)(s)), s * DSUB, DSUB)).sum
          (id, adcD)
        }
        .sortBy { case (id, d) => (d, id) }
        .take(5).zipWithIndex
        .map { case ((id, d), i) =>
          (qId, i + 1, id, cellOf(id).toLong, d,
            subL2(qq, 0, qemb(id), 0, 64))
        }
    }
    val got = rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected, "IVF-PQ pipeline diverges from scalar recompute")
  }

  test("q_ann_ivfpq_index answers from the artifact with pruned partitions") {
    val fromScratch = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir)
      .collect().toSeq
    val fromIndex = SparkEntry.queries("q_ann_ivfpq_index")(spark, sfDir)
      .collect().toSeq
    assert(fromIndex === fromScratch,
      "persisted-index search diverges from the from-scratch pipeline")
    // The code-table scan must carry cell_id partition filters — the
    // nprobe/nlist read-reduction IS the point of the persisted index.
    val idx = sources.IvfPqIndex.ensure(spark, sfDir)
    val probed = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir)
      .select("cell_id").distinct().collect().map(_.getLong(0))
    val pruned = spark.read.parquet(idx + "/codes")
      .filter(org.apache.spark.sql.functions.col("cell_id")
        .isin(probed.map(Long.box): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell_id"),
      s"expected cell_id partition filters in:\n$plan")
    // and the pruned read returns strictly fewer rows than the table
    // when not all cells are probed
    val total = spark.read.parquet(idx + "/codes").count()
    if (probed.length < 4)
      assert(pruned.count() < total, "partition pruning had no effect")
  }

  test("q_ann_pq_rerank recall@5 beats the floor (0.56 measured, pure ADC 0.20)") {
    val rows = SparkEntry.queries("q_ann_pq_rerank")(spark, sfDir).collect()
    assert(rows.length === 25)
    val got = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val corpus = qemb.keys.filter(_ >= 9).toSeq.sorted
    var hit = 0
    for (qId <- 4L until 9L) {
      val qq = qemb(qId)
      val exact = corpus.map(id => (id, subL2(qq, 0, qemb(id), 0, 64)))
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      hit += (got(qId) & exact).size
    }
    val recall = hit.toDouble / 25
    info(f"PQ shortlist-rerank recall@5 = $recall%.2f")
    assert(recall >= 0.4,
      f"recall@5 $recall%.2f below floor 0.4 — shortlist/rerank regressed")
  }

  test("encoded codes stay in the codebook domain") {
    val corpus = qemb.keys.filter(_ >= 9)
    corpus.foreach { id =>
      val c = encode(qemb(id))
      assert(c.length === M && c.forall(j => j >= 0 && j < K))
    }
  }
}
