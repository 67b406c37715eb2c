package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic + determinism checks for the round-6 additions: quantized
  * k-means, SemDeDup, triangle counting, the inverted index, and the
  * key-skew audit. Every one of these must also be PARTITION-COUNT
  * INVARIANT (the driver verifies at 32 threads, tests run at 4): the
  * invariance test re-plans each query under a different
  * shuffle-partition count and demands identical rows.
  */
class ClusteringGraphSpec extends AnyFunSuite {
  import SparkTestBase._

  private val names = Seq("q_cluster_kmeans", "q_dedup_semantic",
    "q_graph_triangles", "q_text_inverted_index", "q_audit_skew")

  private def rows(name: String): Seq[String] = {
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq
  }

  test("new queries are shuffle-partition-count invariant") {
    val conf = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(conf)
    try {
      val at4 = names.map(n => n -> rows(n)).toMap
      spark.conf.set(conf, "7")
      for (n <- names)
        assert(rows(n) == at4(n), s"$n changed under a different " +
          "shuffle partitioning")
    } finally spark.conf.set(conf, before)
  }

  test("k-means clusters partition the corpus") {
    val r = SparkEntry.queries("q_cluster_kmeans")(spark, sfDir).collect()
    assert(r.length == 4, "expected k=4 non-empty clusters")
    val total = T.t(spark, sfDir, "embeddings").count()
    assert(r.map(_.getAs[Long]("n_members")).sum == total)
    val ids = T.t(spark, sfDir, "embeddings")
      .agg(org.apache.spark.sql.functions.sum("vec_id")).head.getLong(0)
    assert(r.map(_.getAs[Long]("id_checksum")).sum == ids)
    assert(r.forall(_.getAs[Long]("inertia") > 0))
  }

  test("k-means inertia does not increase with more Lloyd rounds") {
    // The 3-round registered query vs a 1-round variant built the same
    // way: total inertia (sum of assignment distances) must not grow —
    // the defining monotonicity of Lloyd's algorithm. Integer floor-div
    // centroids can break exact monotonicity only by < 1 quantum per
    // dim; allow that slack.
    import org.apache.spark.sql.functions._
    def inertia(iters: Int): Long = {
      val emb = T.t(spark, sfDir, "embeddings").select(col("vec_id"), expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000)" +
          " as bigint))").as("q"))
      def assign(cent: org.apache.spark.sql.DataFrame) =
        emb.crossJoin(broadcast(cent))
          .withColumn("d", expr(
            "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y))," +
              " 0L, (acc, x) -> acc + x)"))
          .groupBy("vec_id", "q")
          .agg(min(struct(col("d"), col("cid"))).as("best"))
          .select(col("vec_id"), col("q"),
            col("best.cid").as("cid"), col("best.d").as("d"))
      var cent = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cid"), col("q").as("c"))
      for (_ <- 1 to iters) {
        cent = assign(cent)
          .select(col("cid"), posexplode(col("q")))
          .groupBy("cid", "pos")
          .agg(sum("col").as("sv"), count(lit(1)).as("n"))
          .withColumn("cv",
            expr("cast(floor(cast(sv as double) / n) as bigint)"))
          .groupBy("cid")
          .agg(expr("transform(sort_array(collect_list(struct(pos, cv)))," +
            " x -> x.cv)").as("c"))
      }
      assign(cent).agg(sum("d")).head.getLong(0)
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + 64 * 1000,
      s"inertia grew across Lloyd rounds: 1-round=$i1 3-round=$i3")
  }

  test("semdedup accounting is internally consistent") {
    val r = SparkEntry.queries("q_dedup_semantic")(spark, sfDir).collect()
    val total = T.t(spark, sfDir, "embeddings").count()
    assert(r.map(_.getAs[Long]("n_vecs")).sum == total)
    for (row <- r) {
      assert(row.getAs[Long]("n_kept") <= row.getAs[Long]("n_vecs"))
      val dropped = row.getAs[Long]("n_vecs") - row.getAs[Long]("n_kept")
      val ck = row.getAs[Long]("dropped_checksum")
      assert((dropped == 0) == (ck == 0),
        s"dropped=$dropped but checksum=$ck")
    }
  }

  test("triangle metrics are mutually consistent") {
    val r = SparkEntry.queries("q_graph_triangles")(spark, sfDir).head()
    val (edges, wedges, tris) = (r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    assert(edges > 0 && wedges > 0)
    assert(tris <= wedges, "each triangle closes a wedge")
    val cc = r.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0)
    // Exactly 3 wedges close per triangle: coeff == 3T/W (rounded).
    assert(math.abs(cc - 3.0 * tris / wedges) < 1e-6)
  }

  test("inverted index tf sums to the corpus token count") {
    import org.apache.spark.sql.functions._
    val idx = SparkEntry.queries("q_text_inverted_index")(spark, sfDir)
    val tfSum = idx.agg(sum("tf")).head.getLong(0)
    val nTok = T.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(tfSum == nTok)
    val bad = idx.filter(size(split(col("head_postings"), ",")) >
      least(col("tf"), lit(8))).count()
    assert(bad == 0, "head_postings longer than min(tf, 8)")
  }

  test("skew audit quantiles are ordered") {
    val rs = SparkEntry.queries("q_audit_skew")(spark, sfDir).collect()
    assert(rs.length == 3)
    for (r <- rs) {
      val (p50, p95, p99, mx) = (r.getAs[Long]("p50_cnt"),
        r.getAs[Long]("p95_cnt"), r.getAs[Long]("p99_cnt"),
        r.getAs[Long]("max_cnt"))
      assert(p50 <= p95 && p95 <= p99 && p99 <= mx)
      assert(r.getAs[Double]("skew_ratio") >= 1.0)
    }
  }

  test("train/val/test split is exhaustive and disjoint") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q_sample_split")(spark, sfDir)
    val docs = T.t(spark, sfDir, "documents")
    // Exhaustive: per-source split counts re-sum to the corpus, and the
    // id checksums re-sum to the corpus checksum (disjointness follows:
    // equal count + equal sum over disjoint-by-construction buckets).
    val bySrc = r.groupBy("source")
      .agg(sum("n_docs").as("n"), sum("id_checksum").as("ck"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    val truth = docs.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ck"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(bySrc == truth, "split buckets do not re-sum to the corpus")
    val splits = r.select("split").distinct().collect()
      .map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("deterministic mode beats or ties every other value's count") {
    import org.apache.spark.sql.functions._
    val modes = SparkEntry.queries("q_agg_mode")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mode_qty"), r.getAs[Long]("mode_cnt"))).toMap
    val counts = T.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt")).collect()
    for (row <- counts) {
      val (flag, v, c) = (row.getString(0), row.getDouble(1), row.getLong(2))
      val (mv, mc) = modes(flag)
      assert(c < mc || (c == mc && v >= mv),
        s"$flag: value $v (cnt $c) beats reported mode $mv (cnt $mc)")
    }
  }

  test("degree histogram conserves node and degree mass") {
    import org.apache.spark.sql.functions._
    val h = SparkEntry.queries("q_graph_degree_hist")(spark, sfDir)
    val tri = SparkEntry.queries("q_graph_triangles")(spark, sfDir).head()
    // Σ degree_mass = 2 |E|; buckets hold 2^b <= deg < 2^(b+1).
    val mass = h.agg(sum("degree_mass")).head.getLong(0)
    assert(mass == 2 * tri.getAs[Long]("n_edges"))
    h.collect().foreach { r =>
      val b = r.getAs[Int]("log2_degree")
      val (lo, hi) = (r.getAs[Long]("min_degree"), r.getAs[Long]("max_degree"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds degrees [$lo,$hi] outside [2^$b, 2^${b + 1})")
    }
  }

  test("bitwise aggregates obey containment laws") {
    val rs = SparkEntry.queries("q_agg_bitwise")(spark, sfDir).collect()
    for (r <- rs) {
      val (a, o) = (r.getAs[Long]("mask_and"), r.getAs[Long]("mask_or"))
      assert((a & o) == a, "AND-fold must be a subset of the OR-fold")
      val bm = r.getAs[Long]("line_bitmap")
      assert(bm > 0 && bm < 128, "line bitmap must use only bits 0..6")
    }
  }
}
