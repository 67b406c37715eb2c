package graft

import org.scalatest.funsuite.AnyFunSuite

/** MatchPath PTF semantics on constructed sequences: per-row anchoring
  * (overlapping matches), multi-char regex, group isolation.
  */
class MatchPathSpec extends AnyFunSuite {
  import SparkTestBase._

  private def run(rows: Seq[(Long, Long, String)], pattern: String) = {
    import spark.implicits._
    MatchPath(rows.toDF("k", "o", "s"), "k", "o", "s", pattern)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("simple adjacent pattern") {
    val rows = Seq((1L, 1L, "c"), (1L, 2L, "e"), (1L, 3L, "c"), (1L, 4L, "x"))
    assert(run(rows, "ce") === Set((1L, 1L, 2)))
  }

  test("matches anchor at every row (overlaps allowed)") {
    // "eee" with pattern "ee" → matches at rows 1 and 2.
    val rows = Seq((1L, 1L, "e"), (1L, 2L, "e"), (1L, 3L, "e"))
    assert(run(rows, "ee") === Set((1L, 1L, 2), (1L, 2L, 2)))
  }

  test("kleene-star spans variable length") {
    // c x x e matches cx*e with length 4.
    val rows = Seq((1L, 1L, "c"), (1L, 2L, "x"), (1L, 3L, "x"), (1L, 4L, "e"))
    assert(run(rows, "cx*e") === Set((1L, 1L, 4)))
  }

  test("groups do not leak into each other") {
    // 'c' at end of group 1, 'e' at start of group 2: no match.
    val rows = Seq((1L, 1L, "x"), (1L, 2L, "c"), (2L, 1L, "e"), (2L, 2L, "x"))
    assert(run(rows, "ce") === Set.empty[(Long, Long, Int)])
  }

  test("NULL partition key forms its own group") {
    import spark.implicits._
    val df = Seq((Option.empty[Long], 1L, "c"), (None, 2L, "e"),
      (Some(5L), 1L, "c"), (Some(5L), 2L, "e")).toDF("k", "o", "s")
    val out = MatchPath(df, "k", "o", "s", "ce").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((-1L, 1L, 2), (5L, 1L, 2)))
  }

  test("order column, not input order, drives the sequence") {
    val rows = Seq((1L, 2L, "e"), (1L, 1L, "c"))
    assert(run(rows, "ce") === Set((1L, 1L, 2)))
  }

  test("hot key ≥10× the chunk size: chunked scan = unchunked matches") {
    import spark.implicits._
    // One 5000-row key (50 chunks at chunkRows=100) with deterministic
    // pseudo-random symbols, matches straddling chunk boundaries, plus
    // a second key to prove run/chunk state resets. maxMatchLen=8
    // bounds task state at ~107 rows while every cx*e span here is ≤ 6.
    def sym(i: Long): String = (i * 2654435761L % 97) % 7 match {
      case 0 => "c"
      case 1 | 2 => "e"
      case _ => "x"
    }
    val rows = (1L to 5000L).map(i => (1L, i, sym(i))) ++
      (1L to 500L).map(i => (2L, i, sym(i + 13)))
    val df = rows.toDF("k", "o", "s")
    def collect(chunk: Int, mml: Int) =
      MatchPath(df, "k", "o", "s", "cx*e", maxMatchLen = mml,
        chunkRows = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val unchunked = collect(Int.MaxValue, 1 << 12)
    val chunked = collect(100, 8)
    assert(unchunked.nonEmpty)
    assert(chunked === unchunked)
    // A chunk size of 1 row (maximal boundary crossing) still agrees.
    assert(collect(1, 8) === unchunked)
  }

  test("agrees with the lag-window rewrite on real events") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sy = T.t(spark, sfDir, "events")
      .select(col("user_id"), expr("ts_ns div 1000").as("ord"),
        when(col("event_type") === "click", "c")
          .when(col("event_type") === "error", "e")
          .otherwise("x").as("sym"))
    val viaPtf = MatchPath(sy, "user_id", "ord", "sym", "ce")
      .groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("user_id").orderBy("ord")
    val viaLag = sy
      .withColumn("psym", lag("sym", 1).over(w))
      .filter(col("sym") === "e" && col("psym") === "c")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPtf === viaLag)
  }
}
