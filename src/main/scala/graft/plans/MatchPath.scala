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
  * pass over each partition groups CONSECUTIVE keys.
  *
  * Memory is BOUNDED regardless of key-run length (the round-10 spill
  * fix): a key-run is processed in chunks of `chunkRows` rows with a
  * carry-over window of `maxMatchLen - 1` rows between chunks, so task
  * state is O(chunkRows + maxMatchLen) — ~10 B/row over the chunk (an
  * 8 B ordinal plus a 2 B symbol char; the full row payload is never
  * buffered). Hive's PTFOperator bounds the same buffering by SPILLING
  * its whole-partition PTFRowContainer to disk; bounding the match span
  * instead keeps the scan single-pass and needs no spill files. A match
  * is anchored at every row (overlaps allowed, Hive semantics); every
  * match whose greedy attempt spans ≤ `maxMatchLen` rows is found
  * EXACTLY as on the unchunked text — an attempt that would consume
  * more than `maxMatchLen` rows sees truncated text and may shorten or
  * disappear, so callers with unbounded quantifiers (`x*`) must pick
  * `maxMatchLen` ≥ the longest span they care about (the default, 4096,
  * dwarfs any sessionization pattern; chunk boundaries are a
  * deterministic function of the run start, so results are
  * partitioning-stable either way).
  *
  * NULL keys hash into one partition and are processed as their own
  * group, matching Hive's PTF partitioning of NULLs.
  */
object MatchPath {

  /** @param df       input
    * @param keyCol   partition key (BIGINT)
    * @param ordCol   order-within-key (BIGINT, e.g. epoch nanos)
    * @param symCol   single-character symbol column (STRING)
    * @param pattern  regex over the symbol alphabet, e.g. "ce" or "cx*e"
    * @param maxMatchLen guaranteed-exact maximum match span in rows;
    *                 also sizes the chunk carry-over window
    * @param chunkRows rows buffered per chunk (tunable down in tests to
    *                 prove the chunking; memory bound is
    *                 chunkRows + maxMatchLen - 1 rows)
    * @return (key, match_ord BIGINT = ord of the match's first row,
    *          match_len INT)
    */
  def apply(df: DataFrame, keyCol: String, ordCol: String, symCol: String,
      pattern: String, maxMatchLen: Int = 1 << 12,
      chunkRows: Int = 1 << 16): DataFrame = {
    require(maxMatchLen >= 1 && chunkRows >= 1,
      "matchpath: maxMatchLen and chunkRows must be positive")
    val s = df.sparkSession
    import s.implicits._
    val rx = pattern // serialized to executors as a string, compiled there
    val carry = maxMatchLen - 1
    df.select(col(keyCol).cast("long"), col(ordCol).cast("long"),
        col(symCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(ordCol))
      .mapPartitions { rows =>
        // Hive matchpath anchors a match attempt at EVERY row (overlaps
        // allowed) — a zero-width lookahead makes the regex engine do
        // per-position anchoring; group(1) carries the matched span.
        val re = ("(?=(" + rx + "))").r
        // Keys are read as boxed longs so a NULL key is a valid group
        // of its own (getLong on a NULL cell would NPE).
        def keyAt(r: Row): java.lang.Long =
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val it = rows.buffered
        // Outer iterator yields one CHUNK of one key-run per step;
        // carry state threads the (maxMatchLen - 1)-row overlap.
        new Iterator[Iterator[(java.lang.Long, Long, Int)]] {
          var inRun = false
          var curKey: java.lang.Long = null
          var carryOrds: Array[Long] = Array.emptyLongArray
          var carrySyms: String = ""
          def hasNext = inRun || it.hasNext
          def next(): Iterator[(java.lang.Long, Long, Int)] = {
            if (!inRun) {
              curKey = keyAt(it.head); inRun = true
              carryOrds = Array.emptyLongArray; carrySyms = ""
            }
            val ords = scala.collection.mutable.ArrayBuffer.empty[Long]
            ords ++= carryOrds
            val sb = new StringBuilder(carrySyms)
            val target = chunkRows.toLong + carry
            while (sb.length < target && it.hasNext &&
                java.util.Objects.equals(keyAt(it.head), curKey)) {
              val r: Row = it.next()
              ords += r.getLong(1)
              sb += (if (r.isNullAt(2) || r.getString(2).isEmpty) ' '
                     else r.getString(2).charAt(0))
            }
            val runEnded =
              !(it.hasNext && java.util.Objects.equals(keyAt(it.head), curKey))
            // Anchors in the carry tail re-appear at the head of the
            // next chunk with their full lookahead window — emit them
            // there, not here (else truncated duplicates).
            val anchorEnd = if (runEnded) sb.length else sb.length - carry
            val text = sb.toString()
            val out = re.findAllMatchIn(text)
              .takeWhile(_.start < anchorEnd)
              .map(m => (curKey, ords(m.start), m.group(1).length))
              .toArray
            if (runEnded) inRun = false
            else {
              carryOrds = ords.drop(anchorEnd).toArray
              carrySyms = text.substring(anchorEnd)
            }
            out.iterator
          }
        }.flatten
      }
      .toDF("key", "match_ord", "match_len")
  }
}
