package graft.queries

import graft._
import graft.T._
import org.apache.spark.sql.functions._

/** Streaming slice (SURVEY.md §2.9 / stage F). The reference's
  * "streaming" is transactional micro-batch INGEST (HiveStreamingConnection)
  * — no watermarks or event-time windows. The Spark-native capability
  * surface EXCEEDS it: tumbling / sliding / session event-time windows
  * over the `events` table, runnable identically in batch (registered
  * here, oracle-checked) and in Structured Streaming (StreamingSpec runs
  * the SAME tumbling aggregation through readStream + AvailableNow and
  * asserts it matches the batch result — the correctness harness is
  * batch-only by design, Verify.scala writes static parquet).
  *
  * Scale notes (streaming at 100 TB/day): these windowed aggregations
  * are groupBy(window, key) — partial aggregation per micro-batch, state
  * store keyed by (window, key), watermark (set in the streaming twin)
  * bounds state retention. Window starts are emitted as formatted
  * strings: a COMPUTED timestamp round-trips tz-aware from Spark but
  * naive from DuckDB, so strings keep the comparison engine-neutral.
  */
object Streaming extends QueryPack {

  def defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window per event type.
    q("q_stream_tumbling",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |         '%Y-%m-%d %H:%M') AS wstart,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("wstart"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("wstart", "event_type")
    },

    // Sliding 1-hour window, 30-minute slide: every event lands in
    // exactly two windows (the oracle materializes both memberships).
    q("q_stream_sliding",
      """WITH slots AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
        |           - i * INTERVAL '30 minutes' AS ws, value
        |  FROM events, unnest([0, 1]) AS u(i))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS wstart,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM slots GROUP BY ws ORDER BY wstart""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("wstart"),
          col("cnt"), col("sum_value"))
        .orderBy("wstart")
    },

    // Session windows, 10-minute gap, per user: Spark's session_window
    // merges events closer than the gap; the oracle is the classic
    // gaps-and-islands rewrite (a new session starts when the time since
    // the previous event is >= the gap).
    q("q_stream_session",
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP)
        |              - LAG(CAST(ts AS TIMESTAMP)) OVER w
        |              >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          col("n_events"))
        .orderBy("user_id", "sess_start")
    },

    // Stream-stream join, batch twin: purchases within 30 minutes after
    // a click by the same user. The join is EQUI on user_id (hash/SMJ —
    // the time bound is a post-join filter, not a nested loop); the
    // streaming twin in StreamingSpec runs the same condition as a
    // watermarked stream-stream inner join, where the time bound is
    // what lets Spark expire buffered state. Bucketed output keeps the
    // result small and order-stable at any SF.
    q("q_stream_join",
      """WITH c AS (SELECT user_id, epoch_us(ts) AS c_ord FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_ord FROM events
        |      WHERE event_type = 'purchase')
        |SELECT c.user_id % 8 AS ubucket, COUNT(*) AS n_pairs,
        |  CAST(SUM(p_ord - c_ord) AS BIGINT) AS gap_sum
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p_ord >= c_ord AND p_ord <= c_ord + 1800000000
        |GROUP BY ubucket ORDER BY ubucket""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), expr("ts_ns div 1000").as("ord"),
          col("event_type"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ord").as("c_ord"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ord").as("p_ord"))
      c.join(p, col("user_id") === col("p_user") &&
          col("p_ord") >= col("c_ord") &&
          col("p_ord") <= col("c_ord") + 1800000000L)
        .groupBy((col("user_id") % 8).as("ubucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("p_ord") - col("c_ord")).cast("long").as("gap_sum"))
        .orderBy("ubucket")
    },

    // Stream-STATIC enrichment join, batch twin: the standard streaming
    // pattern of joining a fact stream against a slowly-changing
    // dimension table (events × customer on user_id = c_custkey). The
    // dimension side is BROADCAST — in streaming this is exactly how a
    // dimension lookup must ship (the static side is re-broadcast per
    // micro-batch, no stream-side shuffle, no state store at all —
    // unlike a stream-stream join). LEFT join keeps facts whose key has
    // no dimension row (here: user 0), surfacing them under segment
    // 'UNKNOWN' instead of dropping revenue. StreamingSpec runs the
    // same join through readStream and asserts parity.
    q("q_stream_enrich",
      """SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
        |  e.event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY segment, e.event_type
        |ORDER BY segment, e.event_type""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      e.join(broadcast(c), e("user_id") === c("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .orderBy("segment", "event_type")
    },

    // Streaming dedup, batch twin: distinct (user_id, event_type,
    // minute-bucket) — the exactly-once ingest guard a pipeline puts in
    // front of downstream aggregation. Batch = dropDuplicates on the
    // key; the streaming twin in StreamingSpec runs
    // dropDuplicatesWithinWatermark, whose state the watermark bounds
    // (keys older than the delay are evicted — at 100 TB/day the state
    // store holds only the watermark horizon, not the full history).
    // The bucket timestamp never leaves the query (computed timestamps
    // don't round-trip engine-neutrally) — only counts do.
    q("q_stream_dedup",
      """WITH d AS (SELECT DISTINCT user_id, event_type,
        |    time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS mb
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_distinct
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("mb"))
        .dropDuplicates("user_id", "event_type", "mb")
        .groupBy("event_type").agg(count(lit(1)).as("n_distinct"))
        .orderBy("event_type")
    },

    // SKETCH-PER-WINDOW ROLLUP — the streaming-sketch pattern: each
    // (window, event_type) shard builds a theta sketch of its users
    // INDEPENDENTLY (in a real stream: inside its own stateful task,
    // sketches checkpointed as the state blobs), and per-window distinct
    // users come from UNIONING the shard sketches — no re-read of raw
    // events, no giant distinct. This is how you get hourly uniques at
    // 100 TB/day: kB-sized mergeable state per shard instead of a set
    // of every user id. Distinct-per-window ≤ 166 ≪ k=4096, so the
    // sketch runs in exact mode and the DuckDB exact COUNT(DISTINCT)
    // is a bit-true oracle.
    q("q_stream_sketch_rollup",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
        |         '%Y-%m-%d %H:%M') AS wstart,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events
        |GROUP BY wstart ORDER BY wstart""".stripMargin) { (s, dir) =>
      val shards = t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(expr("theta_sketch_agg(user_id)").as("sk"))
      shards
        .groupBy(date_format(col("w.start"), "yyyy-MM-dd HH:mm")
          .as("wstart"))
        .agg(expr("cast(theta_estimate(theta_union_agg(sk)) as bigint)")
          .as("n_users"),
          count(lit(1)).cast("long").as("n_types"))
        .orderBy("wstart")
    },

    // Per-window QUANTILE rollup — the latency-dashboard twin of the
    // theta rollup above, on the KLL sketch (functions/KllSketch.scala):
    // per (day-window, event_type) partial sketches build map-side, and
    // the daily p50/p95 read off a blob union — the raw `value` column
    // never crosses the shuffle, and persisted per-shard blobs re-union
    // for any later slice without rescanning (the pattern a streaming
    // sink keeps in its state store; ThetaSketchSpec proves the same
    // TypedImperativeAggregate design survives streaming state). Exact
    // below compaction (~330 events/day ≪ k=8192), so INCLUSIVE
    // quantiles are order statistics at ceil(q·n) — what the oracle
    // computes relationally.
    q("q_stream_quantile_rollup",
      """WITH r AS (
        |  SELECT strftime(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)),
        |           '%Y-%m-%d') AS wstart,
        |    value AS v,
        |    ROW_NUMBER() OVER (PARTITION BY
        |      time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))
        |      ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY
        |      time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) AS n
        |  FROM events)
        |SELECT wstart, MAX(n) AS n,
        |  MAX(CASE WHEN rn = CAST(ceil(0.50*n) AS BIGINT) THEN v END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(0.95*n) AS BIGINT) THEN v END) AS p95
        |FROM r GROUP BY wstart ORDER BY wstart""".stripMargin) { (s, dir) =>
      val shards = t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(expr("kll_sketch_agg(value, 8192)").as("sk"))
      shards
        .groupBy(date_format(col("w.start"), "yyyy-MM-dd").as("wstart"))
        .agg(expr("kll_union_agg(sk)").as("sk"))
        .select(col("wstart"),
          expr("kll_n(sk)").as("n"),
          expr("kll_quantile(sk, 0.50d)").as("p50"),
          expr("kll_quantile(sk, 0.95d)").as("p95"))
        .orderBy("wstart")
    })
}
