package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-pack claims the oracle can't check: the deterministic
  * samplers must be INVARIANT under physical partitioning (that is
  * what makes them retry-safe on a cluster), the hash-ordered shuffle
  * must plan as top-N (not a global sort), and sequence packing must
  * produce contiguous, token-conserving sequences per shard.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestBase._

  test("stratified sample is invariant under repartitioning") {
    val base = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    // Same query over a differently-partitioned input: a rand()-based
    // sampler would diverge here; the md5-bucket filter cannot.
    val docs = T.t(spark, sfDir, "documents").repartition(7)
    val again = docs
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long") % 100 < 10)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang")
      .collect().map(_.toSeq).toSet
    assert(base === again)
  }

  test("corpus shuffle plans top-N, not a global sort") {
    val df = SparkEntry.queries("q_shuffle_order")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "hash-ordered inspection window materializes a global sort")
  }

  test("packed sequences are contiguous and conserve tokens per shard") {
    val seqs = SparkEntry.queries("q_pack_sequences")(spark, sfDir)
      .collect()
    val byShard = seqs.groupBy(r => (r.getString(0), r.getLong(1)))
    byShard.foreach { case ((source, shard), rows) =>
      val ids = rows.map(_.getLong(2)).sorted
      assert(ids.head === 0L && ids === (0L until ids.length.toLong),
        s"($source, $shard) sequence ids not contiguous: ${ids.toSeq}")
    }
    // Token conservation: packing must not drop or duplicate any doc.
    val packedTokens = seqs.map(_.getLong(4)).sum
    val corpusTokens = T.t(spark, sfDir, "documents")
      .select(sum(size(split(col("text"), " "))).cast("long"))
      .head.getLong(0)
    assert(packedTokens === corpusTokens)
  }

  test("decontamination flags exactly the docs sharing a 5-gram with eval") {
    // Independent in-Spark recomputation with exact gram STRINGS (the
    // query joins on 60-bit hashes): checksum parity proves the hash
    // join introduced no false positives/negatives on this corpus.
    val docs = T.t(spark, sfDir, "documents")
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), col("source"), explode(expr(
        "array_distinct(transform(sequence(1, size(w) - 4)," +
          " i -> concat_ws(' ', slice(w, i, 5))))")).as("gram"))
    val evalG = docs.filter(col("doc_id") < 50).select("gram").distinct()
    val expect = docs.filter(col("doc_id") >= 50)
      .join(evalG, Seq("gram"), "left_semi")
      .select("doc_id").distinct()
      .agg(count(lit(1)), coalesce(sum("doc_id"), lit(0)).cast("long"))
      .head
    val got = SparkEntry.queries("q_decontam_ngram")(spark, sfDir)
      .agg(sum("n_contam").cast("long"),
        sum("contam_checksum").cast("long"))
      .head
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getLong(1) === expect.getLong(1))
  }
}
