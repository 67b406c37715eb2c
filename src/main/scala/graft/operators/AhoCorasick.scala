package graft.operators

/** Aho–Corasick multi-pattern substring matcher — the scale path for
  * exact-substring decontamination (`q_decontam_substring_ac`): one
  * automaton built per task from the broadcast benchmark-snippet list,
  * then each document scans in O(|text| + matches) regardless of how
  * many thousands of snippets are probed. The broadcast contains-join
  * (`q_decontam_substring`) is the relational twin: same topology
  * (needles broadcast, corpus streams shuffle-free), but O(patterns ×
  * text) per document — fine for tens of snippets, not thousands.
  *
  * Plain JVM data structures (array trie + BFS failure links), no
  * Spark types: the instance is built INSIDE mapPartitions from the
  * broadcast pattern array, so nothing here needs to serialize.
  */
final class AhoCorasick private (
    next: Array[scala.collection.mutable.LongMap[Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) {

  /** Distinct ids (indexes into the build list) of every pattern that
    * occurs in `text` at least once.
    */
  def matchedPatternIds(text: String): Iterator[Int] = {
    val seen = new java.util.BitSet()
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      // Follow failure links until a goto edge exists (root loops).
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      val o = out(s)
      var j = 0
      while (j < o.length) { seen.set(o(j)); j += 1 }
      i += 1
    }
    Iterator.unfold(seen.nextSetBit(0)) { b =>
      if (b < 0) None else Some((b, seen.nextSetBit(b + 1)))
    }
  }
}

object AhoCorasick {

  /** Build from the pattern list. Duplicate patterns are fine (every
    * index lands in the output set of the shared terminal node);
    * empty patterns are rejected — "contains empty string" is
    * vacuously true and never a meaningful decontamination probe.
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.LongMap.empty[Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // Trie of goto edges.
    for ((p, pi) <- patterns.zipWithIndex) {
      var s = 0
      for (ch <- p) {
        val c = ch.toLong
        s = next(s).getOrElse(c, {
          next += scala.collection.mutable.LongMap.empty[Int]
          outB += Nil
          val n = next.length - 1
          next(s)(c) = n
          n
        })
      }
      outB(s) = pi :: outB(s)
    }
    // BFS failure links; output sets merge along them so a terminal
    // reached via a suffix still reports its pattern.
    val fail = new Array[Int](next.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for ((_, v) <- next(0)) queue += v
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- next(u)) {
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        val fv = next(f).getOrElse(c, 0)
        fail(v) = if (fv == v) 0 else fv
        outB(v) = outB(v) ++ outB(fail(v))
        queue += v
      }
    }
    new AhoCorasick(next.toArray, fail, outB.map(_.toArray).toArray)
  }
}
