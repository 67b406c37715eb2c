package graft.queries

import graft._
import graft.T._
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY.md §2.7): UnionOperator (UNION ALL),
  * UNION DISTINCT, and the Calcite rewrites Hive uses for
  * INTERSECT [ALL] / EXCEPT [ALL] — all Spark built-ins here.
  *
  * Scale notes: UNION ALL is a zero-shuffle plan concat; DISTINCT and the
  * INTERSECT/EXCEPT family each cost one shuffle on the full row — at
  * 100 TB project to the minimal column set first (done below: 2-column
  * keys, not whole rows).
  */
object SetOps extends QueryPack {

  private val early = "l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'"
  private val late = "l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'"

  private def pairs(s: org.apache.spark.sql.SparkSession, dir: String,
      lateSide: Boolean) = {
    val l = t(s, dir, "lineitem")
    val cut = lit("1998-01-01").cast("timestamp")
    l.filter(if (lateSide) col("l_shipdate") >= cut else col("l_shipdate") < cut)
      .select("l_suppkey", "l_partkey")
  }

  def defs: Seq[QueryDef] = Seq(

    q("q_union_all",
      """SELECT src, COUNT(*) AS cnt FROM (
        |  SELECT 'hi' AS src FROM orders WHERE o_totalprice > 300000
        |  UNION ALL
        |  SELECT 'lo' AS src FROM orders WHERE o_totalprice < 10000
        |) u GROUP BY src ORDER BY src""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 300000).select(lit("hi").as("src"))
      val lo = o.filter(col("o_totalprice") < 10000).select(lit("lo").as("src"))
      hi.unionByName(lo).groupBy("src").agg(count(lit(1)).as("cnt")).orderBy("src")
    },

    q("q_union_distinct",
      """SELECT COUNT(*) AS cnt FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |)""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .union(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .distinct()
        .agg(count(lit(1)).as("cnt"))
    },

    q("q_intersect",
      s"""SELECT COUNT(*) AS cnt FROM (
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $early
         |  INTERSECT
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $late)""".stripMargin) {
      (s, dir) =>
        pairs(s, dir, lateSide = false).intersect(pairs(s, dir, lateSide = true))
          .agg(count(lit(1)).as("cnt"))
    },

    q("q_intersect_all",
      s"""SELECT COUNT(*) AS cnt FROM (
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $early
         |  INTERSECT ALL
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $late)""".stripMargin) {
      (s, dir) =>
        pairs(s, dir, lateSide = false).intersectAll(pairs(s, dir, lateSide = true))
          .agg(count(lit(1)).as("cnt"))
    },

    q("q_except",
      s"""SELECT COUNT(*) AS cnt FROM (
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $early
         |  EXCEPT
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $late)""".stripMargin) {
      (s, dir) =>
        pairs(s, dir, lateSide = false).except(pairs(s, dir, lateSide = true))
          .agg(count(lit(1)).as("cnt"))
    },

    q("q_except_all",
      s"""SELECT COUNT(*) AS cnt FROM (
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $early
         |  EXCEPT ALL
         |  SELECT l_suppkey, l_partkey FROM lineitem WHERE $late)""".stripMargin) {
      (s, dir) =>
        pairs(s, dir, lateSide = false).exceptAll(pairs(s, dir, lateSide = true))
          .agg(count(lit(1)).as("cnt"))
    },

    // UNION BY NAME with missing-column backfill (round 13): schema
    // alignment by COLUMN NAME rather than position — the union a
    // heterogeneous-source pipeline actually wants (two crawls with
    // reordered or partially-overlapping schemas). Spark exposes it as
    // Dataset.unionByName(allowMissingColumns=true): region lacks the
    // region-key column nation carries, so it backfills NULL; the
    // positional swap (name/key order differs between inputs) would
    // silently corrupt a positional UNION. The oracle writes the
    // aligned positional union with the explicit NULL — by-name
    // resolution must be semantically identical to hand-alignment.
    q("q_union_by_name",
      """SELECT r_regionkey AS k, r_name AS name,
        |  CAST(NULL AS INTEGER) AS rk FROM region
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY name, k""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "region")
        .select(col("r_regionkey").as("k"), col("r_name").as("name"))
      val b = t(s, dir, "nation")
        .select(col("n_name").as("name"), col("n_nationkey").as("k"),
          col("n_regionkey").as("rk"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("name", "k")
    })
}
