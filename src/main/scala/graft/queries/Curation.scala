package graft.queries

import graft._
import graft.T._
import org.apache.spark.sql.functions._

/** Training-data CURATION operators (north star, SURVEY.md §7 stage G):
  * the selection stage that sits between raw-corpus analysis
  * (TextAnalysis) and dedup (Dedup) in a real LLM data pipeline —
  * benchmark decontamination, quality-rule filtering, and deterministic
  * stratified sampling.
  *
  * Scale notes (100 TB):
  *  - Decontamination joins on 60-bit md5-prefix gram hashes, never the
  *    gram strings, and the eval-set side (tiny by construction: a
  *    benchmark is KBs–MBs against a 100 TB corpus) is broadcast — the
  *    train-side gram stream is scan → explode → map-side semi probe,
  *    no shuffle of corpus-sized data at all.
  *  - Quality rules are pure per-row integer arithmetic (codegen'd
  *    built-ins, thresholds in integer cross-multiplied form so no
  *    float boundary can drift) + a low-cardinality groupBy.
  *  - The stratified sample is a per-row hash filter — zero shuffles,
  *    deterministic (md5 of the id, not rand()), so a re-run or a
  *    failed-task retry selects the SAME rows; the md5-prefix bucket is
  *    uniform enough that each stratum keeps ~rate% without coordination.
  */
object Curation extends QueryPack {

  /** Portable 60-bit doc/gram hash: identical in Spark
    * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    * (`('0x' || substr(md5(x),1,15))::BIGINT`) — 15 hex digits keep it
    * positive and inside BIGINT.
    */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def defs: Seq[QueryDef] = Seq(

    // Benchmark DECONTAMINATION: docs 0-49 stand in for an eval
    // benchmark; a training doc (id >= 50) is contaminated if it shares
    // ANY word 5-gram with the eval set. Per-source accounting with an
    // id-checksum proving WHICH docs were flagged. 5-grams (not 3) so
    // random vocabulary collisions stay out and only true near-dup overlap
    // triggers — the standard n-gram-overlap decontamination scheme.
    q("q_decontam_ngram",
      """WITH g AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
        |  FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |             range(1, len(w) - 3),
        |             i -> list_aggregate(w[i:i+4], 'string_agg', ' ')))) AS gram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 5)),
        |contam AS (
        |  SELECT DISTINCT t.doc_id FROM g t
        |  WHERE t.doc_id >= 50
        |    AND EXISTS (SELECT 1 FROM g e WHERE e.doc_id < 50 AND e.gh = t.gh))
        |SELECT d.source, COUNT(*) AS n_train,
        |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contam,
        |  CAST(COALESCE(SUM(CASE WHEN c.doc_id IS NOT NULL THEN d.doc_id END), 0)
        |    AS BIGINT) AS contam_checksum
        |FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
        |WHERE d.doc_id >= 50
        |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val grams = docs
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(w) - 4)," +
            " i -> concat_ws(' ', slice(w, i, 5))))")).as("gram"))
        .select(col("doc_id"), h60(col("gram")).as("gh"))
      // Eval-set gram hashes: tiny — broadcast; the train stream is
      // probed map-side (LEFT SEMI), no corpus-sized shuffle.
      val evalGrams = grams.filter(col("doc_id") < 50)
        .select("gh").distinct()
      val contam = grams.filter(col("doc_id") >= 50)
        .join(broadcast(evalGrams), Seq("gh"), "left_semi")
        .select("doc_id").distinct()
        .withColumn("is_c", lit(1))
      docs.filter(col("doc_id") >= 50)
        .join(contam, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("is_c") === 1, 1).otherwise(0)).cast("long")
            .as("n_contam"),
          coalesce(sum(when(col("is_c") === 1, col("doc_id"))), lit(0))
            .cast("long").as("contam_checksum"))
        .orderBy("source")
    },

    // Gopher-style QUALITY RULES: word-count window, mean-word-length
    // window, minimum stopword evidence, short-token ratio cap — each
    // rule a per-row integer predicate (cross-multiplied thresholds: no
    // float boundaries), aggregated per lang with an id-checksum of the
    // all-rules survivors.
    q("q_text_gopher_rules",
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tok,
        |    len(replace(text, ' ', '')) AS sum_len,
        |    len(list_filter(string_split(text, ' '),
        |        w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
        |    len(list_filter(string_split(text, ' '),
        |        w -> len(w) <= 2)) AS n_short
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN n_tok BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS r_wc,
        |    CASE WHEN sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
        |         THEN 1 ELSE 0 END AS r_mwl,
        |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
        |    CASE WHEN 10 * n_short <= n_tok THEN 1 ELSE 0 END AS r_short
        |  FROM f)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(r_wc) AS BIGINT) AS pass_wordcount,
        |  CAST(SUM(r_mwl) AS BIGINT) AS pass_meanwordlen,
        |  CAST(SUM(r_stop) AS BIGINT) AS pass_stopwords,
        |  CAST(SUM(r_short) AS BIGINT) AS pass_shortratio,
        |  CAST(SUM(r_wc * r_mwl * r_stop * r_short) AS BIGINT) AS pass_all,
        |  CAST(COALESCE(SUM(CASE WHEN r_wc * r_mwl * r_stop * r_short = 1
        |                    THEN doc_id END), 0) AS BIGINT) AS keep_checksum
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val f = t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
        .withColumn("sum_len", length(regexp_replace(col("text"), " ", "")))
        .withColumn("n_stop", size(expr(
          "filter(toks, w -> w IN ('the', 'a', 'of', 'and', 'to'))")))
        .withColumn("n_short",
          size(expr("filter(toks, w -> length(w) <= 2)")))
      val r = f.select(col("doc_id"), col("lang"),
        when(col("n_tok").between(20, 100000), 1).otherwise(0).as("r_wc"),
        when(col("sum_len") >= col("n_tok") * 3 &&
          col("sum_len") <= col("n_tok") * 10, 1).otherwise(0).as("r_mwl"),
        when(col("n_stop") >= 2, 1).otherwise(0).as("r_stop"),
        when(col("n_short") * 10 <= col("n_tok"), 1).otherwise(0)
          .as("r_short"))
      r.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("r_wc").cast("long").as("pass_wordcount"),
          sum("r_mwl").cast("long").as("pass_meanwordlen"),
          sum("r_stop").cast("long").as("pass_stopwords"),
          sum("r_short").cast("long").as("pass_shortratio"),
          sum(col("r_wc") * col("r_mwl") * col("r_stop") * col("r_short"))
            .cast("long").as("pass_all"),
          coalesce(sum(when(col("r_wc") * col("r_mwl") * col("r_stop") *
            col("r_short") === 1, col("doc_id"))), lit(0))
            .cast("long").as("keep_checksum"))
        .orderBy("lang")
    },

    // SEQUENCE PACKING: assign documents to fixed-token-budget training
    // sequences by contiguous fill — running token total per shard,
    // sequence id = cumulative-before-me div budget. Sharded by
    // (source, doc_id % 8): real pipelines pack per shard precisely so
    // the running-sum window parallelizes — one unsharded global pack
    // would serialize the corpus through a single window task at 100 TB
    // (raise the shard count with the corpus; packing quality is
    // per-shard-local either way). Integer division on both sides (div
    // / //) — no float boundaries.
    q("q_pack_sequences",
      """WITH d AS (
        |  SELECT source, doc_id % 8 AS shard, doc_id,
        |    len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |p AS (
        |  SELECT source, shard, doc_id, n_tok,
        |    CAST((SUM(n_tok) OVER (PARTITION BY source, shard
        |                           ORDER BY doc_id)
        |           - n_tok) // 2048 AS BIGINT) AS seq_id
        |  FROM d)
        |SELECT source, shard, seq_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM p GROUP BY source, shard, seq_id
        |ORDER BY source, shard, seq_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source", "shard").orderBy("doc_id")
      t(s, dir, "documents")
        .select(col("source"), (col("doc_id") % 8).as("shard"),
          col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .withColumn("seq_id", expr("(cum_tok - n_tok) div 2048"))
        .groupBy("source", "shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("seq_tokens"),
          min(col("doc_id")).cast("long").as("first_doc"))
        .orderBy("source", "shard", "seq_id")
    },

    // Deterministic CORPUS SHUFFLE: the global "shuffle before
    // training" pass, made reproducible — order by a hash of the id
    // instead of rand(). Top-N via TakeOrderedAndProject (no global
    // sort materialization for the bounded inspection window; the full
    // writeout at scale is a sort-partitioned write on the same key).
    q("q_shuffle_order",
      """SELECT doc_id, lang FROM documents
        |ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
        |         doc_id
        |LIMIT 30""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .orderBy(h60(col("doc_id").cast("string")), col("doc_id"))
        .select("doc_id", "lang")
        .limit(30)
    },

    // ADAPTIVE-threshold filter: the cut point comes from the corpus
    // itself (P25 of token count) instead of a fixed constant — the
    // pattern behind percentile-based quality cuts. The threshold is a
    // 1-row aggregate broadcast-joined onto the corpus: NO driver
    // round-trip, the plan stays one job. q=0.25 over integers is
    // exactly representable in binary, so Spark percentile and DuckDB
    // quantile_cont are bit-identical and the boundary cannot drift.
    // (At 100 TB compute the percentile on a sample — the threshold
    // moves by noise, the plan shape is unchanged.)
    q("q_filter_adaptive",
      """WITH d AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |thr AS (SELECT quantile_cont(n_tok, 0.25) AS p25 FROM d)
        |SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM d, thr WHERE d.n_tok >= thr.p25
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tok"))
      val thr = d.agg(expr("percentile(n_tok, 0.25)").as("p25"))
      d.crossJoin(broadcast(thr))
        .filter(col("n_tok") >= col("p25"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .orderBy("lang")
    },

    // Weighted SOURCE MIXING: per-source sampling rates (the "data
    // mixture" step of corpus assembly — upsample curated sources,
    // downsample the crawl). Same deterministic md5 bucket as the
    // stratified sample, with the rate looked up per row — still a
    // pure filter, zero shuffles before the accounting agg.
    q("q_sample_mixture",
      """SELECT source, COUNT(*) AS n_sampled,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
        |      < (CASE WHEN source = 'src0' THEN 50
        |              WHEN source = 'src1' THEN 25
        |              ELSE 10 END)
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(h60(col("doc_id").cast("string")) % 100 <
          when(col("source") === "src0", 50)
            .when(col("source") === "src1", 25)
            .otherwise(10))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .orderBy("source")
    },

    // Deterministic STRATIFIED SAMPLE: keep ~10% per stratum by md5
    // hash-bucket of the id (bucket < 10 of 100) — reproducible across
    // runs/retries (unlike rand()-based sampling) and embarrassingly
    // parallel (a pure filter; the only shuffle is the tiny accounting
    // groupBy). The id-checksum pins exactly WHICH rows were kept.
    q("q_sample_stratified",
      """SELECT lang, COUNT(*) AS n_sampled,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(h60(col("doc_id").cast("string")) % 100 < 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .orderBy("lang")
    })
}
