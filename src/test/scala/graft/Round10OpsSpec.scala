package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 hardening invariants: the pct-rank decile distributed
  * branch's bit-equivalence with the window formulation, RankSelect's
  * null discipline across the size-adaptive cutover, and the fail-loud
  * driver-state domain guard.
  */
class Round10OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  private def scoreFrame = {
    val d = T.t(spark, sfDir, "documents")
    d.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("score"))
  }

  test("pctRankDeciles distributed branch is row-identical to the window") {
    val win = queries.TextAnalysis.pctRankDeciles(scoreFrame).collect()
    val dist = queries.TextAnalysis
      .pctRankDeciles(scoreFrame, forceDistributed = true).collect()
    assert(win.length === dist.length)
    // Both orderBy (lang, decile): positional compare is exact.
    win.zip(dist).foreach { case (w, d) => assert(w === d) }
    // The decile domain must actually be exercised (not all rows in
    // one bucket) for the comparison to mean anything.
    assert(win.map(_.getAs[Int]("decile")).distinct.length >= 8)
  }

  test("pctRankDeciles distributed branch: empty-decile multiplicity (n < 10)") {
    // Tiny per-lang groups: some deciles are empty, so boundary tuples
    // repeat — the count-of-boundaries bucketing must still match the
    // window's rank arithmetic, including the n=1 (percent_rank = 0)
    // and n=2 edge languages.
    import spark.implicits._
    val rows = Seq(
      (1L, "aa", 5), (2L, "aa", 7), (3L, "aa", 7),
      (4L, "bb", 1),
      (5L, "cc", 9), (6L, "cc", 3)).toDF("doc_id", "lang", "score")
    val win = queries.TextAnalysis.pctRankDeciles(rows).collect()
    val dist = queries.TextAnalysis
      .pctRankDeciles(rows, forceDistributed = true).collect()
    assert(win.toSeq === dist.toSeq)
  }

  test("RankSelect ignores nulls identically on both paths") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(2.0)), ("b", Some(4.0)), ("b", None))
      .toDF("g", "v")
    val agg = operators.RankSelect.groupedQuantiles(
      df, "g", "v", Seq(0.25, 0.5, 1.0), safeBytes = Long.MaxValue)
    val dist = operators.RankSelect.groupedQuantiles(
      df, "g", "v", Seq(0.25, 0.5, 1.0), safeBytes = -1L)
    // n counts NON-NULL values on both paths (the aggregate skips
    // nulls; the rank path must see the same multiset).
    assert(agg("a")._1 === 3L && agg("b")._1 === 1L)
    assert(dist("a")._1 === 3L && dist("b")._1 === 1L)
    agg.foreach { case (g, (_, vs)) =>
      vs.zip(dist(g)._2).foreach { case (a, d) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(d), s"group $g")
      }
    }
    assert(agg("a")._2.toSeq === Seq(1.5, 2.0, 3.0))
  }

  test("RankSelect domain guard fails loud on a large group domain") {
    val wide = spark.range(0, 5000)
      .select(col("id").cast("string").as("g"),
        col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      operators.RankSelect.groupedQuantiles(
        wide, "g", "v", Seq(0.5), safeBytes = -1L, matrixCap = 1000)
    }
    assert(e.getMessage.contains("count matrix"))
    // groupedKeysAtRanks shares the guard.
    val wide2 = spark.range(0, 5000)
      .select(col("id").cast("string").as("g"), col("id").as("k1"),
        col("id").as("k2"))
    val e2 = intercept[IllegalArgumentException] {
      operators.RankSelect.groupedKeysAtRanks(
        wide2, n => Array(1L), matrixCap = 1000)
    }
    assert(e2.getMessage.contains("count matrix"))
  }
}
