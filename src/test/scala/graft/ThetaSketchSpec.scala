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

  test("theta sketch aggregates run under streaming state (complete mode)") {
    // The same TypedImperativeAggregate must serialize through the
    // streaming state store (partial sketches persist across
    // micro-batches) — this is the "distinct users so far" dashboard
    // query a pipeline actually keeps running.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stage = SparkTestBase.tmpDir("graft-theta-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val q = spark.readStream.schema(schema)
      // one file per micro-batch forces at least one state round-trip
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      .groupBy("event_type")
      .agg(expr("theta_intersect_estimate(theta_sketch_agg(user_id), " +
        "theta_sketch_agg(user_id))").as("n_users"))
      .writeStream.format("memory").queryName("theta_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("theta_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == exact, s"streaming sketch drift: $streamed vs $exact")
  }

  test("persisted per-slice sketches re-union to the exact count") {
    // The claim that makes sketches a 100 TB primitive: build per-slice
    // sketch blobs once, PERSIST them (parquet binary column), and any
    // later rollup is a union of kilobyte blobs — no corpus rescan.
    // Proof: write per-(event_type, day) sketches, read back,
    // theta_union_agg per type, compare against the exact count.
    val dir = SparkTestBase.tmpDir("graft-sketch-store").toString + "/sk"
    ev.withColumn("day", expr("ts_ns div 86400000000000"))
      .groupBy("event_type", "day")
      .agg(expr("theta_sketch_agg(user_id)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
      .groupBy("event_type")
      .agg(expr("theta_estimate(theta_union_agg(sk))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == exact, s"stored-sketch rollup drift: $stored vs $exact")
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
