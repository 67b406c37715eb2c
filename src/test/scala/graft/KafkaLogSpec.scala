package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka-handler parity slice's two non-oracle contracts:
  * (1) offset seeks are PLAN-level — partition-directory pruning plus
  * parquet offset pushdown, never a filtered full scan; (2) the same
  * topic tails as a stream (readStream over the log) and a batch seek
  * from the stream's last offsets sees exactly the rows the stream saw
  * — the offset-resume handshake a real consumer relies on.
  */
class KafkaLogSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val topic = sources.KafkaLog.ensureTopic(spark, sfDir, 4)

  test("offsets are dense, monotone and unique per partition") {
    val log = spark.read.parquet(topic)
    val byP = log.groupBy("__partition")
      .agg(count(lit(1)).as("n"), min("__offset").as("lo"),
        max("__offset").as("hi"),
        countDistinct("__offset").as("nd"))
      .collect()
    assert(byP.length === 4)
    byP.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1L)
      assert(r.getAs[Long]("nd") === r.getAs[Long]("n"))
    }
  }

  test("offset seek compiles to partition pruning + parquet offset pushdown") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = sources.KafkaLog.readBatch(spark, topic,
      startingOffsets = Map(1 -> 25L), endingOffsets = Map(1 -> 200L))
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata
    }
    assert(scans.nonEmpty)
    // The partition-1 seek branch: __partition is a PARTITION filter
    // (directory pruning — the per-partition consumer seek) and the
    // offset range is a PUSHED filter (row-group min/max skipping).
    val seekScan = scans.find(
      _.get("PushedFilters").exists(_.contains("GreaterThanOrEqual(__offset,25)")))
    assert(seekScan.isDefined, s"no seek scan in: $scans")
    assert(seekScan.get("PartitionFilters").contains("__partition"))
    assert(seekScan.get("PushedFilters").contains("LessThan(__offset,200)"))
  }

  test("stream tail then batch seek from the stream's offsets agree") {
    // Tail the whole topic as a stream (file source over the log dir —
    // the readStream twin of the storage handler) and record, per
    // partition, what a consumer group would commit: max offset + 1.
    val stream = spark.readStream.schema(sources.KafkaLog.schema)
      .parquet(topic)
      .groupBy("__partition")
      .agg(count(lit(1)).as("n"), max("__offset").as("last_off"),
        sum("__offset").as("off_sum"))
    val q = stream.writeStream.format("memory").queryName("t_kafka_tail")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
    val streamed = spark.table("t_kafka_tail").collect()
      .map(r => r.getAs[Int]("__partition") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("last_off"),
          r.getAs[Long]("off_sum")))).toMap
    assert(streamed.size === 4)
    // Batch seek of earliest→latest must see exactly the same rows.
    val batch = sources.KafkaLog.readBatch(spark, topic)
      .groupBy("__partition")
      .agg(count(lit(1)).as("n"), max("__offset").as("last_off"),
        sum("__offset").as("off_sum"))
      .collect()
      .map(r => r.getAs[Int]("__partition") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("last_off"),
          r.getAs[Long]("off_sum")))).toMap
    assert(batch === streamed)
    // Resume handshake: seeking from each partition's committed offset
    // (last_off + 1) yields zero new rows — the log has been fully
    // consumed, and the seek addresses nothing.
    val resume = sources.KafkaLog.readBatch(spark, topic,
      startingOffsets = streamed.map { case (p, (_, last, _)) => p -> (last + 1L) })
    assert(resume.count() === 0L)
  }
}
