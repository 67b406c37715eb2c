package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Port of Hive's `matchpath` PTF (ql/udf/ptf/MatchPath.class,
  * hive-exec-2.3.10 — SURVEY.md §2.5): regex-style pattern matching over
  * ROW SEQUENCES. Each row is classified into a single-character symbol;
  * within each partition (ordered by `ord`) the symbol sequence is
  * scanned for regex matches; one output row per match gives the match's
  * anchor ordinal and length.
  *
  * Spark-first design (SURVEY §7.5.4): this is a whole-operator
  * semantic Spark lacks, implemented at the mapPartitions level — but
  * NOT via groupByKey+flatMapGroups (which materializes each group
  * unsorted). Instead: repartition by key + sortWithinPartitions
  * (key, ord) — Spark's sort-based shuffle does the ordering, exactly
  * like Hive's PTFOperator receives reduce-sorted rows — then a single
  * pass over each partition groups CONSECUTIVE keys. Memory is
  * O(rows-per-group), ~10 B/row (an 8 B ordinal buffer plus a 2 B/char
  * symbol StringBuilder) — the full row payload is never buffered, but
  * the per-group buffers are real: a 1e9-row key costs ~10 GB, and a
  * group beyond 2^31 symbols overflows the StringBuilder — segment such
  * keys upstream (e.g. bucket the ordinal range) before calling.
  * NULL keys hash into one partition and are processed as their own
  * group, matching Hive's PTF partitioning of NULLs.
  */
object MatchPath {

  /** @param df      input
    * @param keyCol  partition key (BIGINT)
    * @param ordCol  order-within-key (BIGINT, e.g. epoch nanos)
    * @param symCol  single-character symbol column (STRING)
    * @param pattern regex over the symbol alphabet, e.g. "ce" or "cx*e"
    * @return (key, match_ord BIGINT = ord of the match's first row,
    *          match_len INT)
    */
  def apply(df: DataFrame, keyCol: String, ordCol: String, symCol: String,
      pattern: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val rx = pattern // serialized to executors as a string, compiled there
    df.select(col(keyCol).cast("long"), col(ordCol).cast("long"),
        col(symCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(ordCol))
      .mapPartitions { rows =>
        // Hive matchpath anchors a match attempt at EVERY row (overlaps
        // allowed) — a zero-width lookahead makes the regex engine do
        // per-position anchoring; group(1) carries the matched span.
        val re = ("(?=(" + rx + "))").r
        // One pass; consecutive-key runs form the groups. Keys are read
        // as boxed longs so a NULL key is a valid group of its own
        // (getLong on a NULL cell would NPE).
        def keyAt(r: Row): java.lang.Long =
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        new Iterator[Iterator[(java.lang.Long, Long, Int)]] {
          val it = rows.buffered
          def hasNext = it.hasNext
          def next(): Iterator[(java.lang.Long, Long, Int)] = {
            val key = keyAt(it.head)
            val ords = scala.collection.mutable.ArrayBuffer.empty[Long]
            val sb = new StringBuilder
            while (it.hasNext && java.util.Objects.equals(keyAt(it.head), key)) {
              val r: Row = it.next()
              ords += r.getLong(1)
              sb += (if (r.isNullAt(2) || r.getString(2).isEmpty) ' '
                     else r.getString(2).charAt(0))
            }
            re.findAllMatchIn(sb.toString())
              .map(m => (key, ords(m.start), m.group(1).length)).iterator
          }
        }.flatten
      }
      .toDF("key", "match_ord", "match_len")
  }
}
