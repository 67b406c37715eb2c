package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The registered window queries are batch twins; this spec runs the
  * SAME tumbling aggregation through Structured Streaming (file source →
  * watermark → windowed agg → memory sink, Trigger.AvailableNow) and
  * asserts it reproduces the batch answer — the ingest-parity slice of
  * SURVEY §2.9.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Raw int64 ts (explicit LongType file-source schema) → epoch µs
    * expression, matching whichever unit this round's events.parquet
    * uses (legacy NANOS or current MICROS — see T.eventsTsIsNanos). */
  private lazy val tsUsExpr: String =
    if (T.eventsTsIsNanos(spark, sfDir)) "ts div 1000" else "ts"

  test("foreachBatch upsert ingest reproduces the batch table (ACID-ingest parity)") {
    // Hive's "streaming" = transactional micro-batch ingest into a
    // table (SURVEY §2.9). Parity demo: stream events, foreachBatch
    // appends each micro-batch into a partitioned parquet table
    // (partition per event_type ≈ delta-per-txn, compaction = dynamic
    // partition overwrite), final table state must equal the batch read.
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = SparkTestBase.tmpDir("graft-ingest-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val sinkDir = SparkTestBase.tmpDir("graft-ingest-sink").toString + "/tbl"
    val q = spark.readStream.schema(schema).parquet(stageDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .repartition(col("event_type"))
          .write.mode("append").partitionBy("event_type").parquet(sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val ingested = spark.read.parquet(sinkDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value")).as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val direct = T.t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value")).as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(ingested === direct)
  }

  test("mapGroupsWithState custom state matches the batch aggregate") {
    // SURVEY §2.9's custom-state surface: per-user event counting kept
    // in explicit GroupState (the KeyValueGroupedDataset API a pipeline
    // uses when built-in windows can't express its state machine).
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = SparkTestBase.tmpDir("graft-state-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val q = spark.readStream.schema(schema).parquet(stageDir.toString)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user, events, state) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "cnt")
      .writeStream.format("memory").queryName("t_state_counts")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // Update mode emits the latest state per key; with a single
    // AvailableNow batch that IS the final count.
    val stateful = spark.table("t_state_counts")
      .groupBy("user_id").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = T.t(spark, sfDir, "events")
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stateful === batch)
  }

  test("streaming tumbling-window agg matches the batch twin") {
    // File-source schema: ts arrives as a raw int64 (ns or µs file unit
    // — tsUsExpr normalizes; see T.eventsTsIsNanos).
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // File stream source requires a DIRECTORY: stage the events file
    // into one (this is also the shape of a real ingest drop-zone).
    val stageDir = SparkTestBase.tmpDir("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withColumn("ts", timestamp_micros(expr(tsUsExpr)))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("wstart"),
        col("event_type"), col("cnt"), col("sum_value"))
    val q = stream.writeStream
      .format("memory").queryName("t_stream_tumbling")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("t_stream_tumbling")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_stream_tumbling")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("watermarked stream-stream join matches the batch twin") {
    // q_stream_join's real streaming form: clicks and purchases as two
    // file streams, inner-joined on user_id with a 30-minute event-time
    // bound. BOTH sides carry watermarks and the join condition bounds
    // event time on each side — that is what lets Spark expire buffered
    // join state instead of holding both streams forever.
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = SparkTestBase.tmpDir("graft-ssj-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    def side(evType: String, pre: String) =
      spark.readStream.schema(schema).parquet(stageDir.toString)
        .filter(col("event_type") === evType)
        .select(col("user_id").as(s"${pre}_user"),
          timestamp_micros(expr(tsUsExpr)).as(s"${pre}_ts"))
        .withWatermark(s"${pre}_ts", "10 minutes")
    val joined = side("click", "c").join(side("purchase", "p"),
      expr("""c_user = p_user AND
              p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"""))
    val q = joined.writeStream
      .format("memory").queryName("t_ssj")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("t_ssj")
      .groupBy((col("c_user") % 8).as("ubucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .cast("long").as("gap_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q_stream_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stream-static broadcast enrichment matches the batch twin") {
    // q_stream_enrich's real streaming form: the fact stream joins a
    // STATIC broadcast dimension — no watermark, no join state store;
    // the dimension is re-broadcast per micro-batch.
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = SparkTestBase.tmpDir("graft-enrich-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val dim = broadcast(T.t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")))
    val q = spark.readStream.schema(schema).parquet(stageDir.toString)
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), T.dsum(col("value")).as("sum_value"))
      .writeStream.format("memory").queryName("t_stream_enrich")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("t_stream_enrich")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_stream_enrich")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("watermark drops late rows and finalizes windows in order") {
    // The one semantic AvailableNow-over-one-file parity tests can't
    // reach: LATE data. Single-file micro-batches (maxFilesPerTrigger=1,
    // mtime+name ordered) over 10-minute tumbling windows with a
    // 10-minute watermark delay. Spark ≥3.4 keeps DUAL watermarks: the
    // late-record filter uses the watermark one batch OLDER than the
    // eviction watermark, so a spacer batch (f2) must sit between the
    // watermark-advancing batch and the late arrival for the drop to
    // engage — exactly the semantics a pipeline must plan around:
    //   f1: 10:05, 10:59  -> watermark after batch = 10:49
    //   f2: 10:58 (spacer) -> eviction wm 10:49 finalizes [10:00,10:10)
    //       cnt=1; late wm catches up to 10:49
    //   f3: 10:05 (LATE — window end 10:10 ≤ late wm 10:49 => DROPPED),
    //       10:55 (on time, window [10:50,11:00) still open)
    //   f4: 11:30          -> advances watermark to 11:20
    //   f5: 11:45          -> batch runs with wm 11:20 ≥ 11:00,
    //       flushing [10:50,11:00) cnt=3 (10:59, 10:58, 10:55)
    // Append mode must emit EXACTLY those two windows; f4/f5's own
    // windows never close and must not appear. A batch aggregate of the
    // same rows would say cnt=2 for the first window — the difference
    // IS the late-drop semantics.
    import org.apache.spark.sql.Row
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = 1717236000L * 1000000L // 2024-06-01 10:00:00 UTC in epoch µs
    def r(id: Long, minOff: Long): Row =
      Row(id, base + minOff * 60000000L, id, "a", 1.0, "{}")
    val stageDir = SparkTestBase.tmpDir("graft-late-src")
    def stage(name: String, order: Int, rows: Seq[Row]): Unit = {
      val tmpd = SparkTestBase.tmpDir("graft-late-w")
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(tmpd.toString + "/d")
      val part = new java.io.File(tmpd.toString + "/d").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = stageDir.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + order * 60000L)
    }
    stage("f1.parquet", 1, Seq(r(1, 5), r(2, 59)))
    stage("f2.parquet", 2, Seq(r(3, 58)))
    stage("f3.parquet", 3, Seq(r(4, 5), r(5, 55)))
    stage("f4.parquet", 4, Seq(r(6, 90)))
    stage("f5.parquet", 5, Seq(r(7, 105)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .withColumn("ets", timestamp_micros(col("ts")))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("w.start"), "HH:mm").as("wstart"), col("cnt"))
      .writeStream.format("memory").queryName("t_stream_late")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    info("batches: " + q.recentProgress.toSeq
      .map(p => s"rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
      .mkString(" | "))
    val emitted = spark.table("t_stream_late")
      .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toSet
    // NOTE (Spark-version coupling): this asserts Spark ≥3.4's dual-
    // watermark schedule (late filter one batch behind eviction) AND
    // mtime-ordered file-source batching. If it fails right after a
    // Spark upgrade, suspect harness drift (watermark propagation or
    // file ordering changed), not a regression in the product code.
    assert(emitted === Set(("10:00", 1L), ("10:50", 3L)),
      "expected dual-watermark late-drop schedule (Spark>=3.4 semantics;" +
        " a Spark upgrade changing watermark propagation or file-source" +
        " ordering breaks this assertion, not the product code)")
  }

  test("foreachBatch MERGE-upserts micro-batches into the ACID table in order") {
    // The reference's streaming IS transactional micro-batch ingest into
    // an ACID table; this runs that exact shape on the repo's AcidTable:
    // ordered micro-batches (maxFilesPerTrigger=1) upsert key overlaps
    // via tombstone-delete + insert deltas, last-writer-wins per key,
    // and the pre-upsert snapshot stays readable by write-id time
    // travel after both batches land.
    import org.apache.spark.sql.Row
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("balance", DoubleType)))
    val root = SparkTestBase.tmpDir("graft-acid-stream").toString + "/tbl"
    AcidTable.create(spark, root, spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 10L).map(i => Row(i, 0.0)), 1), schema))
    val srcDir = SparkTestBase.tmpDir("graft-acid-src")
    def stage(name: String, order: Int, rows: Seq[Row]): Unit = {
      val tmpd = SparkTestBase.tmpDir("graft-acid-wr")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(tmpd.toString + "/d")
      val part = new java.io.File(tmpd.toString + "/d").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = srcDir.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + order * 60000L)
    }
    stage("f1.parquet", 1, (1L to 5L).map(Row(_, 100.0)))
    stage("f2.parquet", 2, (4L to 8L).map(Row(_, 200.0)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // Standard foreachBatch upsert: micro-batch keys are bounded, so
        // collecting them for the tombstone predicate is the idiomatic
        // move (a 100 TB TABLE is fine — it's the BATCH that's small).
        val keys = batch.select("user_id").distinct()
          .collect().map(_.getLong(0)).toSeq
        if (keys.nonEmpty) {
          AcidTable.delete(spark, root, col("user_id").isin(keys: _*))
          AcidTable.insert(spark, root, batch)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val fin = AcidTable.read(spark, root)
      .select("user_id", "balance")
      .collect().map(r2 => (r2.getLong(0), r2.getDouble(1))).toMap
    val expected = ((1L to 3L).map(_ -> 100.0) ++ (4L to 8L).map(_ -> 200.0)
      ++ (9L to 10L).map(_ -> 0.0)).toMap
    assert(fin === expected)
    // Time travel: after f1's upsert (write 3 = create + delete + insert)
    // users 1-5 are 100.0 and 6-10 still 0.0.
    val mid = AcidTable.read(spark, root, Some(3L))
      .select("user_id", "balance")
      .collect().map(r2 => (r2.getLong(0), r2.getDouble(1))).toMap
    assert(mid === ((1L to 5L).map(_ -> 100.0)
      ++ (6L to 10L).map(_ -> 0.0)).toMap)
  }

  test("checkpoint restart resumes exactly-once from committed offsets") {
    // The durability half of the ingest story: a file-source → file-sink
    // stream with a checkpoint is stopped, new data arrives, and a NEW
    // query object restarted on the SAME checkpoint must process ONLY
    // the unseen file (source offsets live in the checkpoint's file log)
    // while the sink's metadata log keeps the output exactly-once — no
    // duplicated f1 rows after restart, nothing reprocessed on a third
    // idle restart.
    import org.apache.spark.sql.Row
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val srcDir = SparkTestBase.tmpDir("graft-ckpt-src")
    val outDir = SparkTestBase.tmpDir("graft-ckpt-out").toString + "/tbl"
    val cpDir = SparkTestBase.tmpDir("graft-ckpt-cp").toString
    def stage(name: String, order: Int, ids: Seq[Long]): Unit = {
      val tmpd = SparkTestBase.tmpDir("graft-ckpt-w")
      spark.createDataFrame(
          spark.sparkContext.parallelize(
            ids.map(i => Row(i, i * 1000000L, i, "a", 1.0, "{}")), 1), schema)
        .write.mode("overwrite").parquet(tmpd.toString + "/d")
      val part = new java.io.File(tmpd.toString + "/d").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = srcDir.resolve(name)
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + order * 60000L)
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir.toString)
        .select(col("event_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", cpDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    stage("f1.parquet", 1, 1L to 50L)
    runOnce() // phase 1: f1 committed
    stage("f2.parquet", 2, 51L to 80L)
    runOnce() // phase 2 (restart): must pick up ONLY f2
    runOnce() // phase 3 (idle restart): must add nothing
    val out = spark.read.parquet(outDir)
    assert(out.count() === 80L)
    assert(out.select("event_id").distinct().count() === 80L)
  }

  test("dropDuplicatesWithinWatermark dedup matches the batch distinct") {
    // q_stream_dedup's real streaming form: watermark + bounded-state
    // dedup on (user_id, event_type, minute bucket). The watermark is
    // what makes the state store finite — dup keys arriving inside the
    // delay are dropped, keys past the horizon are evicted.
    HiveCompatFunctions.ensure(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = SparkTestBase.tmpDir("graft-dedup-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val deduped = spark.readStream.schema(schema).parquet(stageDir.toString)
      .select(col("user_id"), col("event_type"),
        timestamp_micros(expr(tsUsExpr)).as("ets"))
      .withColumn("mb", date_trunc("minute", col("ets")))
      .withWatermark("ets", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "mb")
    val q = deduped.writeStream
      .format("memory").queryName("t_stream_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("t_stream_dedup")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = SparkEntry.queries("q_stream_dedup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("RocksDB state store reproduces the default provider's answers") {
    // The 100 TB streaming-state story: HDFSBackedStateStoreProvider
    // keeps every key's state ON-HEAP per executor — a
    // billion-key dedup/session state OOMs exactly like an
    // un-partitioned window. RocksDBStateStoreProvider (in-box since
    // Spark 3.2, rocksdbjni on this classpath) spills state to local
    // SST files with bounded block-cache memory, so state size is
    // limited by DISK, not heap — the provider a production pipeline
    // runs. Providers must be RESULT-INVARIANT: this runs a stateful
    // aggregation (windowed count+sum) and a watermarked dedup under
    // RocksDB and asserts both match the same pipelines' batch twins,
    // proving the swap is a conf change, not a semantics change.
    HiveCompatFunctions.ensure(spark)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val stageDir = SparkTestBase.tmpDir("graft-rocks-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        stageDir.resolve("events.parquet"))
      val src = spark.readStream.schema(schema).parquet(stageDir.toString)
        .select(col("user_id"), col("event_type"), col("value"),
          timestamp_micros(expr(tsUsExpr)).as("ets"))
      // Stateful path 1: watermarked tumbling window agg.
      val agg = src.withWatermark("ets", "10 minutes")
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val q1 = agg.writeStream.format("memory").queryName("t_rocks_agg")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination(120000); q1.stop()
      val streamedAgg = spark.table("t_rocks_agg")
        .groupBy("event_type").agg(sum("cnt").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val batchAgg = T.t(spark, sfDir, "events")
        .groupBy("event_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(streamedAgg === batchAgg)
      // Stateful path 2: watermarked dedup (billion-key state at scale).
      val dd = src
        .withColumn("mb", date_trunc("minute", col("ets")))
        .withWatermark("ets", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "mb")
      val q2 = dd.writeStream.format("memory").queryName("t_rocks_dedup")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(120000); q2.stop()
      val streamedDd = spark.table("t_rocks_dedup")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val batchDd = SparkEntry.queries("q_stream_dedup")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(streamedDd === batchDd)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState (arbitrary-state v2 API) matches the batch aggregate") {
    // Spark 4's StatefulProcessor replaces mapGroupsWithState as the
    // arbitrary-state surface: typed per-key state handles
    // (ValueState/ListState/MapState) with optional TTL and timers,
    // running only on the RocksDB provider (disk-backed state — the
    // 100 TB story of the previous test made mandatory). Here a
    // per-user processor keeps (count, exact-decimal micro-value sum)
    // in one ValueState and must reproduce the batch groupBy exactly.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig}
    HiveCompatFunctions.ensure(spark)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val stageDir = SparkTestBase.tmpDir("graft-tws-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        stageDir.resolve("events.parquet"))
      val q = spark.readStream.schema(schema).parquet(stageDir.toString)
        // exact integer micro-units: decimal(18,4) scaled by 10^4 —
        // state accumulation stays bit-deterministic in any order
        .select(col("user_id"),
          (col("value").cast("decimal(18,4)") * 10000).cast("long")
            .as("micro"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new TwsCountSum(), TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "cnt", "micro_sum")
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val streamed = spark.table("t_tws")
        .groupBy("user_id")
        .agg(max("cnt").as("cnt"), max("micro_sum").as("ms"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      val batch = T.t(spark, sfDir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          sum((col("value").cast("decimal(18,4)") * 10000).cast("long"))
            .cast("long").as("ms"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(streamed === batch)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** StatefulProcessor for the transformWithState test: per-user
  * (count, exact micro-unit sum) in a single typed ValueState —
  * the v2 arbitrary-state handle shape (named states, explicit
  * TTLConfig, RocksDB-backed).
  */
class TwsCountSum extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("cntsum",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val (c0, s0) = if (st.exists()) st.get() else (0L, 0L)
    var c = c0
    var s = s0
    rows.foreach { case (_, micro) => c += 1; s += micro }
    st.update((c, s))
    Iterator.single((key, c, s))
  }
}
