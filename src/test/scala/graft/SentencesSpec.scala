package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `sentences` on PUNCTUATED text (GenericUDFSentences §2.8): the test
  * corpus is punctuation-free, so q_text_sentences only proves the
  * degenerate one-sentence case — this fixture proves the BreakIterator
  * behavior the corpus can't reach: multi-sentence splitting on ./?/!
  * and punctuation-stripped word tokens.
  */
class SentencesSpec extends AnyFunSuite {
  import SparkTestBase._

  test("sentences splits punctuated text into sentences of word tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello world. How are you? Fine, thanks!"),
      (2L, "one sentence only"),
      (3L, "")).toDF("id", "text")
    val out = df.select($"id", expr("sentences(text)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[String]](1)).toMap

    val three = out(1L)
    assert(three.length === 3, s"expected 3 sentences, got $three")
    assert(three(0) === Seq("Hello", "world"))
    assert(three(1) === Seq("How", "are", "you"))
    // Comma inside a sentence separates word tokens, never sentences.
    assert(three(2) === Seq("Fine", "thanks"))

    assert(out(2L) === Seq(Seq("one", "sentence", "only")))
    assert(out(3L).flatten.isEmpty)
  }
}
