package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

final case class NGramFreq(ngram: String, freq: Long)

/** JVM-wide trim telemetry for the bounded n-gram buffers below.
  *
  * With the Hive precision-factor trim, results become partition/
  * arrival-order dependent (and can undercount) once a group's
  * vocabulary exceeds 2·k·pf entries — below that they are exact. The
  * oracle-checked SFs stay well under the cap, so the determinism gate
  * holds only by that margin; this counter makes a cap-crossing LOUD
  * instead of a silent drift: specs reset it, run the oracle-sized
  * fixture, and assert zero trims (NGramsGuardSpec), so a future SF or
  * fixture that crosses the boundary fails a named test rather than
  * surfacing as an unexplained oracle hash mismatch. Per-JVM (exact in
  * local mode; per-executor on a cluster — still a usable signal).
  */
object NGramsTrims {
  val count = new java.util.concurrent.atomic.AtomicLong(0L)
  def reset(): Unit = count.set(0L)
  def get: Long = count.get()
}

/** Port of Hive's `ngrams` UDAF (GenericUDAFnGrams,
  * hive-exec-2.3.10 ql/udf/generic/GenericUDAFnGrams.class — SURVEY.md
  * §2.4): top-k n-gram frequencies over arrays of tokens.
  *
  * Buffer design (the part that decides whether this survives 100 TB):
  *
  *  - MUTABLE java.util.HashMap mutated in place (Kryo-encoded blob).
  *    Spark's ObjectHashAggregate keeps Aggregator buffers deserialized
  *    between reduce calls, so every n-gram of every row lands as one
  *    in-place HashMap update. The previous immutable `Map.updated`
  *    fold allocated a fresh HAMT path per n-gram — ~600 M path copies
  *    at the 100× scale point turned this query into GC churn (measured
  *    31×/decade there; in-place updates restore ~linear).
  *  - BOUNDED by Hive's own precision-factor rule: Hive never keeps the
  *    full vocabulary either — its NGramEstimator trims the buffer to
  *    k·pf entries (pf defaults sized so the top-k of a zipf-shaped
  *    corpus is exact in practice). Here: when the map exceeds 2·k·pf
  *    entries it is trimmed back to the k·pf largest (count desc, gram
  *    asc). With pf=512 and k=20 the cap is 10 240 — far above the
  *    per-group vocabularies at every oracle-checked SF (≤ ~1 k at
  *    sf0.1, measured), so results stay bit-exact where they are
  *    checked, while at unbounded corpus vocabularies the buffer (and
  *    the partial-aggregate blob that ships in the shuffle) stays
  *    constant-sized — the same approximation Hive documents.
  *
  * For corpus-WIDE top-k prefer the relational formulation (explode →
  * groupBy → top-k), which q_ngrams_top uses; this Aggregator is the
  * Hive API parity surface (`SELECT ngrams_top(words)`), per-group.
  */
final class NGramsAgg(n: Int, k: Int, pf: Int = 512)
    extends Aggregator[Seq[String], java.util.HashMap[String, Long], Seq[NGramFreq]] {

  private val cap = k * pf

  private def bump(b: java.util.HashMap[String, Long], g: String, c: Long): Unit = {
    b.put(g, b.getOrDefault(g, 0L) + c)
    if (b.size > 2 * cap) trim(b)
  }

  /** Hive NGramEstimator-style trim: keep the k·pf most frequent
    * entries (ties broken on the gram so the cut is deterministic).
    */
  private def trim(b: java.util.HashMap[String, Long]): Unit = {
    NGramsTrims.count.incrementAndGet()
    val entries = new java.util.ArrayList(b.entrySet())
    entries.sort { (x: java.util.Map.Entry[String, Long], y: java.util.Map.Entry[String, Long]) =>
      val c = java.lang.Long.compare(y.getValue, x.getValue)
      if (c != 0) c else x.getKey.compareTo(y.getKey)
    }
    var i = cap
    while (i < entries.size()) { b.remove(entries.get(i).getKey); i += 1 }
  }

  def zero: java.util.HashMap[String, Long] = new java.util.HashMap()

  def reduce(b: java.util.HashMap[String, Long], words: Seq[String]): java.util.HashMap[String, Long] = {
    if (words != null)
      words.iterator.sliding(n).withPartial(false)
        .foreach(w => bump(b, w.mkString(" "), 1L))
    b
  }

  def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach((g, c) => bump(a, g, c))
    a
  }

  def finish(m: java.util.HashMap[String, Long]): Seq[NGramFreq] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => NGramFreq(g, c) }
  }

  def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  def outputEncoder: Encoder[Seq[NGramFreq]] = ExpressionEncoder()
}

/** Port of Hive's `context_ngrams` (GenericUDAFContextNGrams): like ngrams
  * but counts only n-grams matching a context pattern where nulls are
  * wildcards, e.g. Seq(Some("spark"), None) counts words following
  * "spark". Same mutable bounded buffer as [[NGramsAgg]] (the context
  * filter already bounds the vocabulary to grams sharing the matched
  * context, so the trim is belt-and-braces here).
  */
final class ContextNGramsAgg(context: Seq[Option[String]], k: Int, pf: Int = 512)
    extends Aggregator[Seq[String], java.util.HashMap[String, Long], Seq[NGramFreq]] {

  private val n = context.size
  private val cap = k * pf

  private def bump(b: java.util.HashMap[String, Long], g: String, c: Long): Unit = {
    b.put(g, b.getOrDefault(g, 0L) + c)
    if (b.size > 2 * cap) {
      NGramsTrims.count.incrementAndGet()
      val entries = new java.util.ArrayList(b.entrySet())
      entries.sort { (x: java.util.Map.Entry[String, Long], y: java.util.Map.Entry[String, Long]) =>
        val cc = java.lang.Long.compare(y.getValue, x.getValue)
        if (cc != 0) cc else x.getKey.compareTo(y.getKey)
      }
      var i = cap
      while (i < entries.size()) { b.remove(entries.get(i).getKey); i += 1 }
    }
  }

  def zero: java.util.HashMap[String, Long] = new java.util.HashMap()

  def reduce(b: java.util.HashMap[String, Long], words: Seq[String]): java.util.HashMap[String, Long] = {
    if (words != null)
      words.iterator.sliding(n).withPartial(false)
        .filter(w => context.zip(w).forall {
          case (Some(c), x) => c == x
          case (None, _) => true
        })
        .foreach(w => bump(b, w.mkString(" "), 1L))
    b
  }

  def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach((g, c) => bump(a, g, c))
    a
  }

  def finish(m: java.util.HashMap[String, Long]): Seq[NGramFreq] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => NGramFreq(g, c) }
  }

  def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  def outputEncoder: Encoder[Seq[NGramFreq]] = ExpressionEncoder()
}
