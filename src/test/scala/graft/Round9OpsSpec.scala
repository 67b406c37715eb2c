package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-9 LLM-pipeline operators that the DuckDB
  * oracle equality can't express directly: the epoch expansion's
  * bounds and partitioning-invariance (retry safety), hard-negative
  * label discipline, semantic-decontam flag soundness against an
  * independent brute-force recomputation, boilerplate accounting
  * conservation, and DoReMi's smoothed-weight floor/normalization.
  */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("epoch expansion: copies bounded by floor/ceil of the repeat factor") {
    val rows = SparkEntry.queries("q_sample_epochs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rPpm = r.getAs[Long]("r_ppm")
      val nDocs = r.getAs[Long]("n_docs")
      val nCopies = r.getAs[Long]("n_copies")
      assert(rPpm >= 1L && rPpm <= 3000000L, s"cap violated: $rPpm")
      val fl = rPpm / 1000000L
      assert(nCopies >= nDocs * fl && nCopies <= nDocs * (fl + 1L),
        s"${r.getString(0)}: $nCopies outside [$nDocs*$fl, $nDocs*${fl + 1}]")
    }
    // The 3-epoch cap must BIND for some sources and not others at this
    // SF (both branches of LEAST exercised).
    val capped = rows.count(_.getAs[Long]("r_ppm") == 3000000L)
    assert(capped > 0 && capped < rows.length,
      s"cap binds for $capped/${rows.length} — want both branches")
  }

  test("epoch expansion is invariant under input repartitioning") {
    val base = SparkEntry.queries("q_sample_epochs")(spark, sfDir)
      .select("source", "n_copies", "copies_checksum")
      .collect().map(_.toSeq).toSet
    // The hash-fraction extra-copy rule is a pure function of doc_id,
    // so a differently-partitioned scan must expand identical copies —
    // that is what makes task retries safe at 1000 executors.
    val again = SparkEntry.queries("q_sample_epochs")(
      spark.newSession(), sfDir)
      .select("source", "n_copies", "copies_checksum")
      .repartition(7)
      .collect().map(_.toSeq).toSet
    assert(base === again)
  }

  test("hard negatives never share the anchor's label and rank densely") {
    val rows = SparkEntry.queries("q_mine_hard_negatives")(spark, sfDir)
      .collect()
    assert(rows.length === 24) // 8 anchors x top-3
    rows.foreach { r =>
      assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("cand_label"),
        s"anchor ${r.getAs[Long]("anchor_id")} mined a same-label negative")
      assert(r.getAs[Long]("cand_id") >= 8L, "anchor leaked into candidates")
    }
    val byAnchor = rows.groupBy(_.getAs[Long]("anchor_id"))
    assert(byAnchor.size === 8)
    byAnchor.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq === Seq(1, 2, 3))
    }
  }

  test("semantic decontam flags exactly the brute-force cosine>=0.3 set") {
    // Independent recomputation in Scala doubles (no quantization, no
    // SQL): the flagged COUNT per label must match the query's.
    val emb = T.t(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => Math.round(x.toDouble * 1000).toDouble)
          .toArray))
    val ev = emb.filter(_._1 < 16)
    val corp = emb.filter(_._1 >= 16)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val expected = corp.groupBy(_._2).map { case (label, vs) =>
      label -> vs.count { case (_, _, q) =>
        val nn = dot(q, q)
        ev.exists { case (_, _, e) =>
          val dt = dot(q, e)
          dt > 0 && 100.0 * dt * dt >= 9.0 * nn * dot(e, e)
        }
      }.toLong
    }
    val got = SparkEntry.queries("q_decontam_semantic")(spark, sfDir)
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("n_flagged"))
      .toMap
    expected.foreach { case (label, n) =>
      assert(got.getOrElse(label, 0L) === n, s"label $label")
    }
  }

  test("boilerplate removal conserves paragraph accounting") {
    val rows = SparkEntry.queries("q_dedup_boilerplate")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ===
        r.getAs[Long]("n_paras"))
    }
    // The 2+ threshold must actually fire somewhere at this SF.
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0L)
  }

  test("RankSelect distributed path is bit-identical to the aggregate path") {
    // The adaptive cutover must be invisible: force the rank-selection
    // path (safeBytes = -1) and compare bit-for-bit against the
    // buffering-aggregate path on the same inputs, including an
    // interpolating quantile (0.95) and both parities of n_g.
    val l = T.t(spark, sfDir, "lineitem")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val agg = operators.RankSelect.groupedQuantiles(
      l, "l_returnflag", "l_extendedprice", qs, safeBytes = Long.MaxValue)
    val dist = operators.RankSelect.groupedQuantiles(
      l, "l_returnflag", "l_extendedprice", qs, safeBytes = -1L)
    assert(agg.keySet === dist.keySet)
    agg.foreach { case (g, (n, vs)) =>
      assert(dist(g)._1 === n)
      // Bit-exact double comparison — the formulas must be the SAME
      // IEEE operations, not merely close.
      vs.zip(dist(g)._2).zipWithIndex.foreach { case ((a, d), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(d), s"group $g q=${qs(i)}")
      }
    }
    // Odd-n coverage: drop one row from one group and recheck medians.
    val lodd = l.filter(!(col("l_returnflag") === lit("A") &&
      col("l_orderkey") === l.select(max(when(col("l_returnflag") === "A",
        col("l_orderkey")))).head.getLong(0)))
    val a2 = operators.RankSelect.groupedQuantiles(
      lodd, "l_returnflag", "l_extendedprice", Seq(0.5),
      safeBytes = Long.MaxValue)
    val d2 = operators.RankSelect.groupedQuantiles(
      lodd, "l_returnflag", "l_extendedprice", Seq(0.5), safeBytes = -1L)
    a2.foreach { case (g, (n, vs)) =>
      assert(d2(g)._1 === n)
      assert(java.lang.Double.doubleToLongBits(vs(0)) ===
        java.lang.Double.doubleToLongBits(d2(g)._2(0)), s"group $g")
    }
  }

  test("doremi smoothed weights normalize and respect the uniform floor") {
    val rows = SparkEntry.queries("q_sample_doremi")(spark, sfDir).collect()
    val k = rows.length.toLong
    assert(k > 1)
    val sumFinal = rows.map(_.getAs[Long]("w_final_ppm")).sum
    // Integer flooring loses at most ~1 ppm per source in each of the
    // two divisions; the smoothing preserves the total.
    assert(Math.abs(sumFinal - 1000000L) <= 2 * k, s"sum=$sumFinal")
    // (1-c)w + c/k with c=1/100 puts a hard floor of 1e6/(100k) ppm
    // under every domain — no source is ever starved to zero.
    rows.foreach { r =>
      assert(r.getAs[Long]("w_final_ppm") >= 1000000L / (100L * k))
    }
  }
}
