package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property fuzz for the sketch aggregates: on RANDOM long/string
  * multisets (duplicates, negatives, skew — shapes the events corpus
  * never produces), the theta estimate must equal the exact distinct
  * count (below sampling) and the frequency sketch must equal the
  * exact grouped counts (below eviction), regardless of partitioning.
  */
object SketchLawsSpec extends Properties("SketchLaws") {
  import SparkTestBase._

  private val longs: Gen[List[Long]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.choose(-50L, 50L), Gen.choose(Long.MinValue, Long.MaxValue))))

  property("theta estimate == exact distinct on random multisets") =
    Prop.forAllNoShrink(longs, Gen.choose(1, 7)) { (xs, parts) =>
      import spark.implicits._
      HiveCompatFunctions.ensure(spark)
      val df = xs.toDF("x").repartition(parts)
      val est = df.agg(expr(
        "theta_intersect_estimate(theta_sketch_agg(x), theta_sketch_agg(x))"))
        .collect()(0).getLong(0)
      est == xs.distinct.size.toLong
    }

  private val words: Gen[List[String]] =
    Gen.choose(1, 300).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b", "c", "dd", "ee", "", "é", "x y")))

  property("freq sketch top-k == exact counts on random multisets") =
    Prop.forAllNoShrink(words, Gen.choose(1, 7)) { (ws, parts) =>
      import spark.implicits._
      HiveCompatFunctions.ensure(spark)
      val df = ws.toDF("term").repartition(parts)
      val sk = df.agg(expr("freq_sketch_topk(term, 100)").as("tops"))
        .select(explode(col("tops")).as("t"))
        .select(col("t.term"), col("t.freq")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val exact = ws.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      sk == exact
    }
}
