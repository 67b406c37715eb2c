package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE tokenizer training: the distributed trainer must be bit-equal to
  * an INDEPENDENT in-memory reference implementation (greedy
  * left-to-right merges, lexicographic tie-break — Sennrich et al.'s
  * algorithm restated from scratch, no shared code), on both a
  * hand-checkable fixture and the real corpus vocabulary. ASCII-only
  * inputs keep Scala's UTF-16 compare and Spark's UTF-8 binary compare
  * identical for the tie-break.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestBase._

  // ---- reference implementation (driver-side, array scans) ----------

  private def refMerge(s: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(vocab: Map[String, Long], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var syms = vocab.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector :+ BpeTrain.EndMark, f)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round, l, r, l + r, cnt))
        syms = syms.map { case (s, f) => (refMerge(s, l, r), f) }
        round += 1
      }
    }
    out.toSeq
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  // ---- fixture: the classic Sennrich vocabulary ----------------------

  test("trainer matches the reference on the classic fixture") {
    import spark.implicits._
    val fixture = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val vocab = fixture.toSeq.toDF("word", "freq")
    val got = collectMerges(BpeTrain.train(vocab, 6))
    assert(got === refTrain(fixture, 6))
    // Spot-check the known head of the sequence: 'es' (newest+widest,
    // 9) then 'est' (9) — the worked example from the BPE paper.
    assert(got.take(2).map(m => (m._2, m._3, m._5)) ===
      Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("trainer matches the reference on the corpus vocabulary") {
    val vocab = T.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val refVocab = vocab.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collectMerges(BpeTrain.train(vocab, 8)) === refTrain(refVocab, 8))
  }

  test("encodeWord replays the merge table like the reference") {
    import spark.implicits._
    val fixture = Map("low" -> 5L, "newest" -> 6L, "widest" -> 3L)
    val merges = refTrain(fixture, 6).map(m => (m._2, m._3))
    // Words seen in training AND an unseen word that reuses learned
    // subunits — both must segment exactly like a reference replay.
    val words = Seq("newest", "lowest", "wide")
    val got = words.toDF("w")
      .select(BpeTrain.encodeWord(col("w"), merges).as("toks"))
      .collect().map(_.getSeq[String](0).toVector)
    val want = words.map { w =>
      merges.foldLeft(w.map(_.toString).toVector :+ BpeTrain.EndMark) {
        case (s, (l, r)) => refMerge(s, l, r)
      }
    }
    assert(got.toSeq === want)
  }

  test("pair counting plans no join — explode + aggregate only") {
    val plan = SparkEntry.queries("q_bpe_pair_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n${plan.take(1500)}")
    assert(plan.contains("Generate"), "pair fan-out should be a Generate")
  }
}
