package graft.queries

import graft._
import graft.T._
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / distribution surface (SURVEY.md §2.6):
  * ReduceSinkOperator's four modes (ORDER BY / SORT BY / DISTRIBUTE BY /
  * CLUSTER BY), LimitOperator (+offset), top-N pushdown, TABLESAMPLE
  * bucket sampling.
  *
  * Scale notes: global top-N never sorts globally — Spark plans
  * TakeOrderedAndProject (per-partition heap + driver merge of N rows),
  * exactly Hive's LimitPushdownOptimizer topN. DISTRIBUTE/CLUSTER BY map
  * to repartition(col) / repartition+sortWithinPartitions — the building
  * block for write-time layout, not for query results (per-partition
  * order is not a global contract, hence rows-only check).
  */
object Sorting extends QueryPack {

  def defs: Seq[QueryDef] = Seq(

    // ORDER BY + LIMIT → TakeOrderedAndProject (top-N pushdown).
    q("q_sort_topn",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    },

    // LIMIT + OFFSET (LimitOperator w/ offset, Hive 3 surface).
    q("q_sort_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 5""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5).limit(10)
    },

    // Mixed-direction sort with explicit null placement.
    q("q_sort_nulls",
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_custkey DESC LIMIT 50""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
          .orderBy(col("seg").asc_nulls_first, col("c_custkey").desc)
          .limit(50)
    },

    // TABLESAMPLE(BUCKET 4 OUT OF 10 ON l_orderkey): Hive buckets int
    // columns by value, so the bucket filter is pmod(key, y) = x-1
    // (FilterDesc.SampleDesc — SURVEY.md §2.2).
    q("q_sample_bucket",
      """SELECT COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 10 = 3""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
      l.filter(pmod(col("l_orderkey"), lit(10)) === 3)
        .agg(count(lit(1)).as("cnt"), dsum(l("l_quantity")).as("sum_qty"))
    },

    // DISTRIBUTE BY + SORT BY (CLUSTER BY): the write-time layout
    // primitive (co-location for SMB joins, RLE-friendly sort).
    // Partition count follows the session's shuffle parallelism (at
    // 100 TB: sized so each partition is a few hundred MB). The oracle
    // checks the clustering invariant RELATIONALLY: after DISTRIBUTE BY
    // l_orderkey, every key lives in exactly one partition, so the max
    // over keys of distinct-partition-count is the literal 1 the oracle
    // emits; cnt/sum_qty prove the shuffle lost/duplicated nothing.
    // (Partition-local sortedness — not relationally observable — stays
    // asserted in SortingSpec.)
    q("q_cluster_by",
      """SELECT l_orderkey % 10 AS bucket, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(1 AS BIGINT) AS max_parts_per_key
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val clustered = t(s, dir, "lineitem")
        .repartition(col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("pid", spark_partition_id())
      clustered.groupBy("l_orderkey")
        .agg(count(lit(1)).as("k_cnt"),
          sum(dec(col("l_quantity"))).as("k_qty"),
          countDistinct(col("pid")).as("k_parts"))
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(sum(col("k_cnt")).cast("long").as("cnt"),
          sum(col("k_qty")).cast("double").as("sum_qty"),
          max(col("k_parts")).as("max_parts_per_key"))
        .orderBy("bucket")
    },

    // Z-ORDER layout key (operators/ZOrder.scala): Morton-interleave
    // (o_custkey, order-day) so a clustered write makes parquet min/max
    // stats prune box queries on EITHER dimension — the multi-dim
    // extension of CLUSTER BY above. The key is pure codegen'd bit
    // math, bit-identical in ANSI SQL, so it's oracle-checked exactly;
    // ZOrderSpec proves the layout EFFECT (row-group skipping) on real
    // writes. 16-bit lanes: custkey and day ordinal both fit at this
    // SF; wider keys keep correctness but need rescaling for locality.
    q("q_layout_zorder",
      """WITH d AS (
        |  SELECT o_orderkey, o_custkey % 65536 AS x,
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      % 65536 AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, ((x | (x << 8)) & 16711935) AS x,
        |              ((y | (y << 8)) & 16711935) AS y FROM d),
        |s2 AS (SELECT o_orderkey, ((x | (x << 4)) & 252645135) AS x,
        |              ((y | (y << 4)) & 252645135) AS y FROM s1),
        |s3 AS (SELECT o_orderkey, ((x | (x << 2)) & 858993459) AS x,
        |              ((y | (y << 2)) & 858993459) AS y FROM s2),
        |s4 AS (SELECT o_orderkey, ((x | (x << 1)) & 1431655765) AS x,
        |              ((y | (y << 1)) & 1431655765) AS y FROM s3)
        |SELECT o_orderkey, CAST(x | (y << 1) AS BIGINT) AS zkey
        |FROM s4 ORDER BY zkey, o_orderkey LIMIT 50""".stripMargin) { (s, dir) =>
      import graft.operators.ZOrder
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          ZOrder.zkey(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1995-01-01"))).as("zkey"))
        .orderBy("zkey", "o_orderkey")
        .limit(50)
    })
}
