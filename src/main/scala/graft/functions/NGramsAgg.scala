package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

final case class NGramFreq(ngram: String, freq: Long)

/** Port of Hive's `ngrams` UDAF (GenericUDAFnGrams,
  * hive-exec-2.3.10 ql/udf/generic/GenericUDAFnGrams.class — SURVEY.md
  * §2.4): top-k n-gram frequencies over arrays of tokens.
  *
  * Hive estimates frequencies with a pruned heap; here the count is exact.
  * NOTE ON SCALE: the Map buffer holds every distinct n-gram seen by a
  * partial aggregate. At 100 TB prefer the relational formulation
  * (explode n-grams → groupBy → top-k window), which Spark executes with
  * map-side partial aggregation and spilling — see the `q_ngrams_top`
  * query whose oracle does exactly that. This Aggregator exists for
  * Hive API parity (`SELECT ngrams_top(words)`), usable per-group where
  * group cardinality is bounded.
  */
final class NGramsAgg(n: Int, k: Int)
    extends Aggregator[Seq[String], Map[String, Long], Seq[NGramFreq]] {

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], words: Seq[String]): Map[String, Long] =
    if (words == null) b
    else words.iterator.sliding(n).withPartial(false)
      .map(_.mkString(" "))
      .foldLeft(b)((m, g) => m.updated(g, m.getOrElse(g, 0L) + 1L))

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a)((m, kv) => m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2))

  def finish(m: Map[String, Long]): Seq[NGramFreq] =
    m.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => NGramFreq(g, c) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[NGramFreq]] = ExpressionEncoder()
}

/** Port of Hive's `context_ngrams` (GenericUDAFContextNGrams): like ngrams
  * but counts only n-grams matching a context pattern where nulls are
  * wildcards, e.g. Seq(Some("spark"), None) counts words following
  * "spark". Exact counts, same scale caveat as [[NGramsAgg]].
  */
final class ContextNGramsAgg(context: Seq[Option[String]], k: Int)
    extends Aggregator[Seq[String], Map[String, Long], Seq[NGramFreq]] {

  private val n = context.size

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], words: Seq[String]): Map[String, Long] =
    if (words == null) b
    else words.iterator.sliding(n).withPartial(false)
      .filter(w => context.zip(w).forall {
        case (Some(c), x) => c == x
        case (None, _) => true
      })
      .map(_.mkString(" "))
      .foldLeft(b)((m, g) => m.updated(g, m.getOrElse(g, 0L) + 1L))

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a)((m, kv) => m.updated(kv._1, m.getOrElse(kv._1, 0L) + kv._2))

  def finish(m: Map[String, Long]): Seq[NGramFreq] =
    m.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => NGramFreq(g, c) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[NGramFreq]] = ExpressionEncoder()
}
