package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-items sketch laws (functions/FreqSketch.scala): exactness
  * below eviction, shard-merge identity, and agreement with the exact
  * relational top-k.
  */
class FreqSketchSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val terms = T.t(spark, sfDir, "documents")
    .select(explode(split(col("text"), " ")).as("term"))

  private def topsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.agg(expr("freq_sketch_topk(term, 10)").as("tops"))
      .select(explode(col("tops")).as("t"))
      .select(col("t.term"), col("t.freq")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("sketch top-k equals the exact relational top-k below eviction") {
    val exact = terms.groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(topsOf(terms) == exact)
  }

  test("sharded partials merge to the direct sketch result") {
    val direct = topsOf(terms)
    val sharded = topsOf(terms.repartition(13, col("term")))
    assert(direct == sharded, s"merge drift: $direct vs $sharded")
  }

  test("q_sketch_freq_topk returns 10 strictly ordered rows") {
    val rows = SparkEntry.queries("q_sketch_freq_topk")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array((t1, f1), (t2, f2)) =>
      assert(f1 > f2 || (f1 == f2 && t1 < t2), "ordering violated")
    }
  }
}
