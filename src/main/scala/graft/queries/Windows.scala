package graft.queries

import graft._
import graft.T._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function / PTF surface (SURVEY.md §2.5): Hive's PTFOperator +
  * WindowingTableFunction — ranking family (GenericUDAFRank/DenseRank/
  * RowNumber/PercentRank/CumeDist/NTile), analytic family (Lead/Lag/
  * FirstValue/LastValue incl. ignoreNulls), and UDAFs over ROWS/RANGE
  * frames (ValueBoundaryScanner family).
  *
  * Scale notes (100 TB): a window = one shuffle on the PARTITION BY key +
  * an in-partition sort; Spark's WindowExec buffers one partition-key
  * group at a time (spillable ExternalAppendOnlyUnsafeRowArray — the twin
  * of Hive's spillable PTFRowContainer). Every window here is partitioned
  * (never a global, single-task ORDER BY over all rows), multiple window
  * functions share one WindowExec when their spec matches, and prefix
  * frames (UNBOUNDED PRECEDING .. CURRENT ROW) stream in bounded memory —
  * the same trick as Hive's GenericUDAFStreamingEvaluator. Predicates on
  * the partition key are pushed BELOW the window (partition-preserving);
  * predicates on other columns go after.
  */
object Windows extends QueryPack {

  def defs: Seq[QueryDef] = Seq(

    // Ranking family: rank / dense_rank / row_number. Tie-break on the
    // unique o_orderkey so row_number is deterministic in both engines.
    q("q_win_rank",
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  RANK()       OVER w AS rnk,
        |  DENSE_RANK() OVER w AS drnk,
        |  ROW_NUMBER() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rn <= 5
        |ORDER BY o_orderstatus, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 5)
        .orderBy("o_orderstatus", "rn")
    },

    // ntile / percent_rank / cume_dist. These need the WHOLE partition
    // before emitting (no streaming frame) — WindowExec buffers per
    // customer-segment group; filter AFTER the window (the filter column
    // is not the partition key).
    q("q_win_ntile",
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 5) AS prank,
        |  ROUND(CUME_DIST() OVER w, 5) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |QUALIFY c_custkey <= 200
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 5).as("prank"),
          round(cume_dist().over(w), 5).as("cdist"))
        .filter(col("c_custkey") <= 200)
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    },

    // lead / lag (GenericUDAFLead/Lag): prior/next order price per
    // customer. The custkey filter is ON the partition key → pushed below
    // the window (partition-preserving, prunes the shuffle).
    q("q_win_lead_lag",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice)  OVER w AS prev_price,
        |  LEAD(o_totalprice) OVER w AS next_price,
        |  o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          (col("o_totalprice") -
            coalesce(lag(col("o_totalprice"), 1).over(w), col("o_totalprice")))
            .as("delta"),
          col("o_orderdate"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .drop("o_orderdate")
    },

    // first_value / last_value with IGNORE NULLS (GenericUDAFFirstValue/
    // LastValue `ignoreNulls` arg) over the full-partition frame.
    q("q_win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(hi_price IGNORE NULLS) OVER w AS first_hi,
        |  LAST_VALUE(hi_price IGNORE NULLS)  OVER w AS last_hi,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS hi_price
        |      FROM orders WHERE o_custkey < 50)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").filter(col("o_custkey") < 50)
        .withColumn("hi_price",
          when(col("o_totalprice") > 200000, col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("hi_price"), ignoreNulls = true).over(w).as("first_hi"),
          last(col("hi_price"), ignoreNulls = true).over(w).as("last_hi"),
          first(col("o_orderkey")).over(w).as("first_key"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // UDAF over a bounded ROWS frame: 3-row moving sum/avg/min/count.
    // Decimal-exact sum (see T.dec) so both engines agree bit-for-bit.
    q("q_win_rows_frame",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER w AS DOUBLE) AS mov_sum,
        |  CAST(MIN(o_totalprice) OVER w AS DOUBLE) AS mov_min,
        |  COUNT(*) OVER w AS mov_cnt
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("mov_sum"),
          min(col("o_totalprice")).over(w).cast("double").as("mov_min"),
          count(lit(1)).over(w).as("mov_cnt"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // UDAF over a value-RANGE frame (ValueBoundaryScanner semantics):
    // per status, orders whose key lies within the last 1000 keys.
    // The unique BIGINT order key makes the frame deterministic.
    q("q_win_range_frame",
      """SELECT o_orderstatus, o_orderkey,
        |  COUNT(*) OVER w AS in_range,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER w AS DOUBLE) AS range_sum
        |FROM orders WHERE o_orderkey < 3000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_orderkey"))
        .rangeBetween(-1000, Window.currentRow)
      t(s, dir, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderstatus"), col("o_orderkey"),
          count(lit(1)).over(w).as("in_range"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("range_sum"))
        .orderBy("o_orderstatus", "o_orderkey")
    },

    // Running total — the prefix frame (UNBOUNDED PRECEDING .. CURRENT
    // ROW) that streams in bounded memory (GenericUDAFStreamingEvaluator
    // equivalent; Spark's WindowExec does the same for prefix frames).
    q("q_win_running_total",
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |       OVER w AS DOUBLE) AS run_qty,
        |  ROW_NUMBER() OVER w AS rn
        |FROM lineitem WHERE l_orderkey < 300
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem").filter(col("l_orderkey") < 300)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast("double").as("run_qty"),
          row_number().over(w).as("rn"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    },

    // Top-k per group — the canonical row_number pattern (also the
    // building block the LLM-pipeline ANN top-k reuses).
    q("q_win_topk_per_group",
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey < 30)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // MAX CONSECUTIVE-DAY STREAK per user — the gaps-and-islands trick:
    // day - dense_rank(day) is constant within a run of consecutive
    // active days, so the streak is a count per (user, island). Two
    // same-key window/agg steps over one user_id exchange; integer day
    // ordinals from µs division. The corpus-wide rollup (longest streak
    // per user, then distribution) is the engagement query every event
    // warehouse runs.
    q("q_win_max_streak",
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, COUNT(*) AS streak
        |  FROM isl GROUP BY user_id, island),
        |mx AS (SELECT user_id, MAX(streak) AS max_streak
        |       FROM streaks GROUP BY user_id)
        |SELECT max_streak, COUNT(*) AS n_users,
        |  CAST(SUM(user_id) AS BIGINT) AS user_checksum
        |FROM mx GROUP BY max_streak ORDER BY max_streak""".stripMargin) {
      (s, dir) =>
      val days = t(s, dir, "events")
        .select(col("user_id"),
          expr("ts_ns div 1000 div 86400000000").as("day"))
        .distinct()
      val wd = Window.partitionBy("user_id").orderBy("day")
      val mx = days
        .withColumn("island", col("day") - dense_rank().over(wd))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("streak"))
        .groupBy("user_id")
        .agg(max(col("streak")).as("max_streak"))
      mx.groupBy("max_streak")
        .agg(count(lit(1)).as("n_users"),
          sum(col("user_id")).cast("long").as("user_checksum"))
        .orderBy("max_streak")
    })
}
