package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta sketch laws (functions/ThetaSketch.scala): exactness below the
  * sampling threshold, shard-merge identity (what makes persisted
  * per-partition sketches legal), and inclusion-exclusion consistency
  * of the set-algebra estimators.
  */
class ThetaSketchSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val ev = T.t(spark, sfDir, "events")

  test("theta estimate is exact below the sampling threshold") {
    val r = ev.groupBy("event_type")
      .agg(expr("theta_intersect_estimate(theta_sketch_agg(user_id), " +
        "theta_sketch_agg(user_id))").as("est"),
        countDistinct("user_id").as("exact"))
      .collect()
    r.foreach { row =>
      assert(row.getLong(1) == row.getLong(2),
        s"${row.getString(0)}: est ${row.getLong(1)} != exact ${row.getLong(2)}")
    }
  }

  test("sharded partial sketches merge to the direct sketch estimate") {
    val direct = ev.agg(
      expr("theta_intersect_estimate(theta_sketch_agg(user_id), " +
        "theta_sketch_agg(user_id))").as("n")).collect()(0).getLong(0)
    // Force a many-partition build so partial-buffer serialize/merge
    // paths run, then compare against the single-shot estimate.
    val sharded = ev.repartition(13, col("event_id"))
      .agg(expr("theta_intersect_estimate(theta_sketch_agg(user_id), " +
        "theta_sketch_agg(user_id))").as("n")).collect()(0).getLong(0)
    assert(direct == sharded, s"merge drift: $direct vs $sharded")
  }

  test("q_sketch_theta obeys inclusion-exclusion") {
    val r = SparkEntry.queries("q_sketch_theta")(spark, sfDir).collect()(0)
    val (both, either) = (r.getLong(0), r.getLong(1))
    val (aOnly, bOnly) = (r.getLong(2), r.getLong(3))
    assert(either == both + aOnly + bOnly,
      s"|A∪B| $either != |A∩B| $both + |A\\B| $aOnly + |B\\A| $bOnly")
    assert(both >= 0 && aOnly >= 0 && bOnly >= 0)
  }
}
