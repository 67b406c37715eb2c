package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The ngrams/context_ngrams Aggregators (Hive GenericUDAFnGrams /
  * GenericUDAFContextNGrams twins) after the round-8 buffer rewrite:
  * mutable in-place HashMap + Hive-style precision-factor trim.
  *
  * Contract under test:
  *  1. EXACT below the cap — while a group's distinct-n-gram vocabulary
  *     stays under k·pf, results are identical to a naive full count
  *     (this is the regime every oracle-checked SF runs in).
  *  2. Bounded buffer — the map never exceeds 2·k·pf entries no matter
  *     how many distinct n-grams stream through.
  *  3. Zipf-robust head under trim — on a skew-heavy stream whose head
  *     frequencies dominate the trimmed tail, the top-k survives
  *     aggressive trimming exactly (the approximation Hive documents).
  */
class NGramsAggSpec extends AnyFunSuite with Matchers {

  private def naiveTopK(docs: Seq[Seq[String]], n: Int, k: Int): Seq[(String, Long)] =
    docs.flatMap(_.sliding(n).filter(_.size == n).map(_.mkString(" ")))
      .groupBy(identity).map { case (g, xs) => (g, xs.size.toLong) }
      .toSeq.sortBy { case (g, c) => (-c, g) }.take(k)

  private def aggTopK(agg: NGramsAgg, docs: Seq[Seq[String]],
      splitAt: Int): Seq[(String, Long)] = {
    // Simulate partial aggregation: two independent buffers merged.
    val (a, b) = docs.splitAt(splitAt)
    val ba = a.foldLeft(agg.zero)(agg.reduce)
    val bb = b.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(ba, bb)).map(f => (f.ngram, f.freq))
  }

  test("exact vs naive count while vocabulary is under the cap") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    (0 until 100).foreach { trial =>
      // 6-letter vocab → ≤36 distinct bigrams, far under 20*512.
      val docs = Seq.fill(1 + rnd.nextInt(40))(
        Seq.fill(2 + rnd.nextInt(28))(vocab(rnd.nextInt(vocab.size))))
      val agg = new NGramsAgg(2, 20)
      val cut = rnd.nextInt(docs.size + 1)
      assert(aggTopK(agg, docs, cut) === naiveTopK(docs, 2, 20),
        s"trial $trial diverged from the naive count")
    }
  }

  test("buffer stays bounded at 2*k*pf under unbounded vocabulary") {
    val agg = new NGramsAgg(2, 5, pf = 4) // cap 20, trim threshold 40
    var buf = agg.zero
    // 100k distinct bigrams stream through one buffer.
    (0 until 50000).foreach { i =>
      buf = agg.reduce(buf, Seq(s"u$i", s"v$i", s"w$i"))
    }
    assert(buf.size <= 2 * 5 * 4,
      s"buffer grew to ${buf.size} despite trim cap")
  }

  test("zipf head survives aggressive trimming exactly") {
    // Head grams appear 1000/500/250×; 5000 tail grams once each. Head
    // grams sort before every tail gram on the (count desc, gram asc)
    // trim order at equal counts too (a/c/e < t...), so no trim can
    // ever evict them — their final counts must be EXACT even though
    // the buffer holds at most 384 of 5003 distinct grams.
    val head = Seq.fill(1000)(Seq("a", "b")) ++
      Seq.fill(500)(Seq("c", "d")) ++ Seq.fill(250)(Seq("e", "f"))
    val tail = (0 until 5000).map(i => Seq(s"t$i", s"z$i"))
    val docs = new scala.util.Random(42).shuffle(head ++ tail)
    val agg = new NGramsAgg(2, 3, pf = 64) // cap 192 << 5003 vocab
    val top = aggTopK(agg, docs, docs.size / 2)
    top.map(_._1) shouldBe Seq("a b", "c d", "e f")
    top.map(_._2) shouldBe Seq(1000L, 500L, 250L)
  }

  test("trim telemetry: zero in the exact regime, loud when the cap is crossed") {
    // The determinism gate holds only while vocabularies stay under
    // 2*k*pf (advice, round 8) — NGramsTrims makes a crossing a named
    // failure instead of a silent drift from the oracle. Exact-regime
    // fixture first: the same shape the oracle-checked queries run.
    NGramsTrims.reset()
    val small = new NGramsAgg(2, 20) // cap 10240
    val docs = Seq.fill(200)(Seq("a", "b", "c", "d"))
    small.finish(docs.foldLeft(small.zero)(small.reduce))
    assert(NGramsTrims.get === 0L,
      "oracle-regime fixture tripped the trim — the exactness margin is gone")

    // Cap-crossing fixture: the counter must fire.
    val tiny = new NGramsAgg(2, 5, pf = 4) // trim threshold 40
    var buf = tiny.zero
    (0 until 200).foreach(i => buf = tiny.reduce(buf, Seq(s"u$i", s"v$i")))
    assert(NGramsTrims.get > 0L, "cap crossed but no trim was counted")
    NGramsTrims.reset()
  }

  test("context filter counts only matching n-grams (exact under cap)") {
    val agg = new ContextNGramsAgg(Seq(Some("spark"), None), 10)
    val docs = Seq(
      Seq("spark", "joins", "fast", "spark", "joins"),
      Seq("spark", "aggs", "spark", "joins"))
    val buf = docs.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).map(f => (f.ngram, f.freq))
    out shouldBe Seq(("spark joins", 3L), ("spark aggs", 1L))
  }
}
