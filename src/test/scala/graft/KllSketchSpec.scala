package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile-sketch laws (functions/KllSketch.scala): exact-mode
  * quantiles are literal order statistics, shard-merge equals direct
  * build (what makes persisted per-slice sketches legal), and blobs
  * survive a parquet round-trip re-union.
  */
class KllSketchSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val orders = T.t(spark, sfDir, "orders")

  private val ranks = Seq(0.25, 0.50, 0.75, 0.95)

  /** Exact order statistic at ceil(q*n) over a sorted multiset. */
  private def orderStat(sorted: Array[Double], q: Double): Double =
    sorted(math.ceil(q * sorted.length).toInt - 1)

  test("exact mode: INCLUSIVE quantile == order statistic at ceil(q*n)") {
    // Deterministic values with duplicates and negatives; n < k so the
    // sketch never compacts and getQuantile must be exact.
    val vs = (1 to 3000).map(i => ((i * 2654435761L) % 997).toDouble - 400)
    val sk = KllDoublesSketch.newHeapInstance(8192)
    vs.foreach(sk.update)
    assert(!sk.isEstimationMode, "n=3000 < k=8192 must stay exact mode")
    val sorted = vs.sorted.toArray
    for (q <- ranks ++ Seq(0.01, 0.999, 1.0))
      assert(sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE) ==
        orderStat(sorted, q), s"rank $q")
  }

  test("merge of exact shards stays exact and equals the direct build") {
    val vs = (1 to 5000).map(i => ((i * 40503L) % 7919).toDouble)
    val shards = vs.grouped(500).map { g =>
      val s = KllDoublesSketch.newHeapInstance(8192)
      g.foreach(s.update)
      s
    }
    val merged = KllDoublesSketch.newHeapInstance(8192)
    shards.foreach(merged.merge)
    assert(!merged.isEstimationMode, "total 5000 < k=8192 must stay exact")
    val sorted = vs.sorted.toArray
    for (q <- ranks)
      assert(merged.getQuantile(q, QuantileSearchCriteria.INCLUSIVE) ==
        orderStat(sorted, q), s"rank $q")
  }

  test("sharded partial sketches merge to the direct sketch quantiles") {
    def quants(df: org.apache.spark.sql.DataFrame) = df
      .agg(expr("kll_sketch_agg(o_totalprice, 8192)").as("sk"))
      .select(ranks.map(q => expr(s"kll_quantile(sk, ${q}d)")): _*)
      .collect()(0).toSeq
    // 13-way repartition forces the partial-buffer serialize/merge path.
    val direct = quants(orders)
    val sharded = quants(orders.repartition(13, col("o_orderkey")))
    assert(direct == sharded, s"merge drift: $direct vs $sharded")
  }

  test("persisted per-slice blobs re-union to the exact quantiles") {
    val dir = SparkTestBase.tmpDir("graft-kll").toString + "/slices"
    // Slice by clerk-ish shard, persist one blob per slice...
    orders.withColumn("shard", pmod(col("o_orderkey"), lit(16)))
      .groupBy("shard")
      .agg(expr("kll_sketch_agg(o_totalprice, 8192)").as("sk"))
      .write.parquet(dir)
    // ...then a later job unions the stored blobs, never the raw rows.
    val got = spark.read.parquet(dir)
      .agg(expr("kll_union_agg(sk)").as("sk"))
      .select(expr("kll_n(sk)").as("n") +:
        ranks.map(q => expr(s"kll_quantile(sk, ${q}d)").as(s"q$q")): _*)
      .collect()(0)
    val vs = orders.select("o_totalprice").collect().map(_.getDouble(0))
    assert(got.getLong(0) == vs.length)
    val sorted = vs.sorted
    ranks.zipWithIndex.foreach { case (q, i) =>
      assert(got.getDouble(i + 1) == orderStat(sorted, q),
        s"rank $q: ${got.getDouble(i + 1)} != ${orderStat(sorted, q)}")
    }
  }
}
