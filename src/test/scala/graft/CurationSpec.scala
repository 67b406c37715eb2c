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

  test("chunks tile each document: full windows, stride overlap, no loss") {
    val W = 32; val S = 24
    val chunks = SparkEntry.queries("q_chunk_stride")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    val docs = T.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.keySet === docs.keySet, "some docs produced no chunks")
    for ((id, rows) <- chunks) {
      val w = docs(id)
      val byIdx = rows.sortBy(_.getLong(1))
      // contiguous chunk ids from 0
      assert(byIdx.map(_.getLong(1)).toSeq ===
        (0L until byIdx.length.toLong), s"doc $id chunk ids not contiguous")
      byIdx.zipWithIndex.foreach { case (r, i) =>
        val nTok = r.getLong(3)
        // every chunk but the last is a full window
        if (i < byIdx.length - 1) assert(nTok === W.toLong,
          s"doc $id chunk $i is not a full window")
        // first/last token line up with the stride offsets in the doc
        assert(r.getString(4) === w(i * S),
          s"doc $id chunk $i first_tok misaligned")
        assert(r.getString(5) === w(i * S + nTok.toInt - 1),
          s"doc $id chunk $i last_tok misaligned")
      }
      // coverage: the final chunk reaches the last token exactly
      val last = byIdx.last
      assert((byIdx.length - 1) * S + last.getLong(3) === w.length.toLong,
        s"doc $id chunks do not cover the document")
    }
  }

  test("PII scrub is total: zero residual, markers present, originals gone") {
    val rows = SparkEntry.queries("q_pii_redact")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L, "injected email not detected")
      assert(r.getLong(2) === 1L, "injected ip not detected")
      assert(r.getLong(3) === 1L, "injected phone not detected")
      assert(r.getLong(4) === 0L, s"doc ${r.getLong(0)} has PII residual")
    }
    // Recompute one redacted body and check the markers replaced the
    // injected values verbatim (the query only ships the fingerprint).
    val red = T.t(spark, sfDir, "documents").filter(col("doc_id") === 7)
      .select(regexp_replace(regexp_replace(regexp_replace(
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com ip 10.0."),
          col("doc_id") % 256, lit("."), (col("doc_id") * 7) % 256,
          lit(" tel 555-"), lpad(col("doc_id").cast("string"), 4, "0")),
        "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"),
        "555-\\d{4}", "<PHONE>"))
      .head.getString(0)
    assert(red.contains("<EMAIL>") && red.contains("<IP>") &&
      red.contains("<PHONE>"))
    assert(!red.contains("@example.com") && !red.contains("555-"))
  }

  test("q_pipeline_curate stage counts shrink monotonically per source") {
    val rows = SparkEntry.queries("q_pipeline_curate")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, q, u, kept) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(docs >= q && q >= u && u >= kept,
        s"${r.getString(0)}: pipeline not monotone $docs>=$q>=$u>=$kept")
    }
    // The pipeline must actually drop something at the quality and
    // sampling stages somewhere, or the stage flags are vacuous.
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum > 0,
      "quality stage dropped nothing anywhere")
    assert(rows.map(r => r.getLong(3) - r.getLong(4)).sum > 0,
      "sampling stage dropped nothing anywhere")
  }

  test("mean surprisal is positive and spans a real range across docs") {
    val rows = SparkEntry.queries("q_text_surprisal")(spark, sfDir)
      .collect().map(_.getDouble(2))
    assert(rows.nonEmpty)
    assert(rows.forall(_ > 0.0), "surprisal must be positive (cnt <= total)")
    // A degenerate implementation (e.g. joining the wrong count) tends
    // to collapse every doc to the same score.
    assert(rows.distinct.length > 1, "surprisal is constant across docs")
  }

  test("DSIR top-100 is enriched for the target domain") {
    val rows = SparkEntry.queries("q_sample_dsir")(spark, sfDir).collect()
    assert(rows.length === 100)
    val langIx = rows.head.fieldIndex("lang")
    val topEn = rows.count(_.getString(langIx) == "en").toDouble / 100
    val docs = T.t(spark, sfDir, "documents")
    val baseEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    // The whole point of importance resampling: documents that look
    // like the target (English) distribution must be over-represented
    // in the selection relative to the raw corpus.
    assert(topEn > baseEn,
      s"no target enrichment: top-100 en=$topEn vs corpus en=$baseEn")
    // Ranks are the contiguous 1..100 ordering of the output.
    val rankIx = rows.head.fieldIndex("rank")
    assert(rows.map(_.getLong(rankIx)).sorted.toSeq === (1L to 100L))
  }

  test("DSIR probes broadcast model tables and plans distributed top-k") {
    val p = SparkEntry.queries("q_sample_dsir")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "feature log-ratio table not broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 not a distributed top-k")
  }
}
