package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 invariants the oracle hash can't articulate on its own:
  * the SemDeDup cell count now SCALES with the corpus (k = max(4,
  * n div 1250) — the round-15 shape fix for the n²/8 pair blow-up that
  * ate the sf30 budget), and its two-level routed assignment must be
  * EXACT — bit-equal to the direct argmin over all k centroids —
  * whenever the probed coarse cells cover the space (k=4 bench shape:
  * one coarse cell; k=8 synthetic shape: still one coarse cell). The
  * reference below is an independent single-level implementation of
  * the whole query (the pre-round-15 plan, k parameterized).
  */
class Round15OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private lazy val sfDir = SparkTestBase.sfDir

  /** Direct (single-level, no coarse tier) SemDeDup reference. */
  private def directSemantic(dir: String): Seq[Seq[Any]] = {
    val s = spark
    SparkEntry.tune(s) // dot_f registration
    def dot(a: String, b: String) = expr(s"dot_f($a, $b)")
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(round(cast(x as double)" +
          " * 1000) as bigint))").as("q"))
      .withColumn("qd", col("q").cast("array<double>"))
      .withColumn("en", dot("qd", "qd"))
    val k = math.max(4L,
      s.read.parquet(s"$dir/embeddings.parquet").count() / 1250L)
    val cent = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qd").as("cd"),
        col("en").as("cn"))
    val cells = emb.crossJoin(broadcast(cent))
      .withColumn("d",
        (col("en") + col("cn") - lit(2) * dot("qd", "cd")).cast("long"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cid"))).as("best"),
        first(col("label")).as("label"), first(col("q")).as("q"))
      .select(col("vec_id"), col("label"), col("q"),
        col("best.cid").as("cid"))
      .withColumn("qd", col("q").cast("array<double>"))
      .withColumn("nn", dot("qd", "qd").cast("long"))
    val a = cells.select(col("cid"), col("vec_id").as("a_id"),
      col("qd").as("qa"), col("nn").as("na"))
    val b = cells.select(col("cid"), col("vec_id").as("b_id"),
      col("qd").as("qb"), col("nn").as("nb"))
    val dropped = a.join(b, "cid").filter(col("a_id") < col("b_id"))
      .withColumn("dt", dot("qa", "qb").cast("long"))
      .filter(col("dt") > 0 &&
        lit(25) * col("dt").cast("decimal(38,0)") * col("dt") >=
          lit(4) * col("na").cast("decimal(38,0)") * col("nb"))
      .select(col("b_id").as("dv")).distinct()
    cells.join(broadcast(dropped), col("vec_id") === col("dv"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dv").isNull, 1).otherwise(0)).cast("long")
          .as("n_kept"),
        sum(coalesce(col("dv"), lit(0L))).cast("long")
          .as("dropped_checksum"))
      .orderBy("label")
      .collect().toSeq.map(_.toSeq)
  }

  test("routed SemDeDup equals the direct single-level plan on real data (k=4)") {
    val got = SparkEntry.queries("q_dedup_semantic")(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(got === directSemantic(sfDir))
    assert(got.nonEmpty)
  }

  test("routed SemDeDup equals the direct plan at a corpus-scaled k > 4") {
    // synthetic 10k-vector corpus → k = 8: exercises the k-formula's
    // scaling branch and the fine→coarse plumbing (all fine centroids
    // still route through coarse cell 0, so exactness must hold)
    val s = spark
    import s.implicits._
    val dir = SparkTestBase.tmpDir("graft-semded-k8").toString
    (0L until 10000L).toDF("vec_id")
      .withColumn("label", concat(lit("l"), pmod(col("vec_id"), lit(5))))
      .withColumn("embedding",
        expr("transform(sequence(1, 64), i -> cast(" +
          "(pmod(vec_id * 31 + i * 7, 2000) - 1000) / 1000.0 as float))"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().toSeq.map(_.toSeq)
    assert(got === directSemantic(dir))
    // the synthetic corpus actually has 5 labels accounted
    assert(got.length === 5)
  }
}
