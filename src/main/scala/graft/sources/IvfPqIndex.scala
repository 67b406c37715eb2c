package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the "build once, query many" production
  * shape of q_ann_ivfpq (queries/Similarity.scala): the expensive
  * steps (coarse assignment, residual PQ encode) run ONCE and land on
  * disk as tables; every later query answers from the artifact.
  *
  * Layout (all parquet, memoized by the embeddings content tag):
  *   codes/     (vec_id, codes array<int>)  PARTITIONED BY cell_id —
  *              so an nprobe search reads only the probed cells'
  *              directories (partition pruning, plan-asserted in
  *              Round12OpsSpec). 8 codes/vector = the 32×-compressed
  *              scan side.
  *   cells/     (cell_id, c array<bigint>)   — 4 coarse centroids.
  *   codebook/  (cid, s, cv array<bigint>)   — 32 shared residual
  *              codebook entries.
  *
  * Same deterministic parameters as q_ann_ivfpq (cells = seed vectors
  * vec_id < 4, residual codebook = residuals of vectors 9..12), so the
  * from-index search replays that query's oracle bit-for-bit.
  *
  * Two maintenance modes (round 14 — the delta-append directive):
  *   ensure            — one-shot full build (the scheduled-rebuild
  *                       posture).
  *   ensureIncremental — base build over the STANDING corpus
  *                       (vec_id % 10 != 7, the ensureLshIndex split)
  *                       followed by a DELTA APPEND of the batch: the
  *                       append job reads the FROZEN model tables back
  *                       from the artifact (it never recomputes them),
  *                       encodes ONLY the batch rows, and appends new
  *                       files into the existing cell_id partitions.
  *                       Encoding is per-row deterministic given the
  *                       frozen model, so base ∪ delta is row-for-row
  *                       identical to a from-scratch rebuild
  *                       (spec-proven in Round14OpsSpec); probe cost is
  *                       unchanged — searches still read only probed
  *                       partitions. Completion gate: a _GRAFT_DONE
  *                       marker written AFTER the append (parquet's
  *                       own _SUCCESS lands mid-sequence here, so it
  *                       cannot gate a multi-phase build — the
  *                       HBase-slice lesson generalized).
  *
  * 100 TB shape: the index build is one corpus pass (broadcast cells +
  * codebook, no corpus shuffle except the partitioned write); a daily
  * append touches ONLY the new batch (probe cost stays nprobe/nlist of
  * the code table); the search reads bytes, not floats, with the cell
  * routing decided driver-side from the model tables — exactly how a
  * production ANN service schedules probes.
  */
object IvfPqIndex {

  private def dot(a: String, b: String) =
    expr(s"dot_f($a, $b)")

  /** Quantized embeddings: (vec_id, q bigint[64], qd double[64], en). */
  private[graft] def quantized(s: SparkSession, dir: String): DataFrame =
    graft.T.t(s, dir, "embeddings").select(col("vec_id"), expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000)" +
        " as bigint))").as("q"))
      .withColumn("qd", col("q").cast("array<double>"))
      .withColumn("en", dot("qd", "qd"))

  /** 8-dim subspace slices of array column `vcol`, carrying `carry`. */
  private[graft] def slices(df: DataFrame, vcol: String,
      carry: String*): DataFrame = df
    .select(carry.map(col) :+ posexplode(expr(
      s"transform(sequence(0, 7), s -> slice($vcol, s*8 + 1, 8))")): _*)
    .select(carry.map(col) :+ col("pos").as("s") :+ col("col").as("v"): _*)
    .withColumn("vn", dot("v", "v"))

  /** Coarse assignment + residual: (vec_id, cell_id, rd). min(struct)
    * carries the winning centroid array so the residual needs no
    * re-join (cell_id is unique per distance tie-break, so the
    * trailing cd never participates in the ordering).
    */
  private def assignResidual(corp: DataFrame, cellsB: DataFrame): DataFrame =
    corp.crossJoin(cellsB)
      .withColumn("d",
        (col("en") + col("cn") - lit(2) * dot("qd", "cd")).cast("long"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cell_id"), col("cd"))).as("best"),
        first(col("qd")).as("qd"))
      .select(col("vec_id"), col("best.cell_id").as("cell_id"),
        expr("zip_with(qd, best.cd, (a, b) -> a - b)").as("rd"))

  /** The deterministic model frames: broadcast cells (vec_id < 4) and
    * the shared residual codebook (residuals of vectors 9..12 under
    * those cells) — fixed seed ids, so the frames are identical
    * whatever corpus slice is being encoded.
    */
  private def modelFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = quantized(s, dir)
    val cellsB = broadcast(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell_id"), col("qd").as("cd"),
        col("en").as("cn")))
    val seeds = emb.filter(col("vec_id") >= 9 && col("vec_id") < 13)
    val cb = broadcast(
      slices(assignResidual(seeds, cellsB), "rd", "vec_id")
        .select((col("vec_id") - 9).cast("int").as("cid"), col("s"),
          col("v").as("cv"), col("vn").as("cvn")))
    (cellsB, cb)
  }

  /** The frozen model frames read BACK from a persisted index — same
    * column shapes as modelFrames (quantized components are integers,
    * so the bigint parquet round-trip is exact). This is what the
    * delta-append job and the searches consume.
    */
  private[graft] def readModelFrames(s: SparkSession,
      path: String): (DataFrame, DataFrame) = {
    val cellsB = broadcast(s.read.parquet(path + "/cells")
      .withColumn("cd", col("c").cast("array<double>"))
      .withColumn("cn", dot("cd", "cd"))
      .select(col("cell_id"), col("cd"), col("cn")))
    val cb = broadcast(s.read.parquet(path + "/codebook")
      .withColumn("cv", col("cv").cast("array<double>"))
      .withColumn("cvn", dot("cv", "cv")))
    (cellsB, cb)
  }

  /** Residual-PQ encode of a corpus slice under frozen model frames:
    * (vec_id, cell_id, codes int[8]). Per-row deterministic — the
    * property the delta-append equality proof rests on.
    */
  private def encode(corp: DataFrame, cellsB: DataFrame,
      cb: DataFrame): DataFrame =
    slices(assignResidual(corp, cellsB), "rd", "vec_id", "cell_id")
      .join(cb, "s")
      .withColumn("d",
        (col("vn") + col("cvn") - lit(2) * dot("v", "cv")).cast("long"))
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d"), col("cid"))).as("best"),
        first(col("cell_id")).as("cell_id"))
      .groupBy("vec_id")
      .agg(first(col("cell_id")).as("cell_id"), expr(
        "transform(sort_array(collect_list(struct(s, best.cid as code)))," +
          " x -> x.code)").as("codes"))

  /** Build (memoized) and return the index root path — full corpus. */
  def ensure(s: SparkSession, dir: String): String = {
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivfpq_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      graft.T.contentTag(dir, "embeddings")
    val done = new java.io.File(path + "/codes", "_SUCCESS")
    if (!done.exists()) {
      writeModels(s, dir, path)
      val (cellsB, cb) = readModelFrames(s, path)
      encode(quantized(s, dir).filter(col("vec_id") >= 9), cellsB, cb)
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(path + "/codes")
    }
    path
  }

  /** Incrementally-maintained twin of `ensure`: base build over the
    * standing corpus, then a delta append of the batch (vec_id % 10
    * == 7) encoded under the frozen on-disk model. Returns the index
    * root; content is row-identical to `ensure`'s.
    */
  def ensureIncremental(s: SparkSession, dir: String): String = {
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivfpqinc_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      graft.T.contentTag(dir, "embeddings")
    val done = new java.io.File(path, "_GRAFT_DONE")
    if (!done.exists()) {
      val corp = quantized(s, dir).filter(col("vec_id") >= 9)
      writeModels(s, dir, path)
      val (cellsB, cb) = readModelFrames(s, path)
      // base: the standing corpus (everything ingested before today)
      encode(corp.filter(pmod(col("vec_id"), lit(10)) =!= 7), cellsB, cb)
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(path + "/codes")
      // delta: ONLY the batch — new files appended into the existing
      // cell_id partition directories, frozen model untouched
      encode(corp.filter(pmod(col("vec_id"), lit(10)) === 7), cellsB, cb)
        .write.mode("append").partitionBy("cell_id")
        .parquet(path + "/codes")
      done.createNewFile()
    }
    path
  }

  /** Model tables: cells + shared residual codebook (written before
    * any code table — the completion gate is always downstream).
    */
  private def writeModels(s: SparkSession, dir: String, path: String): Unit = {
    val (cellsB, cb) = modelFrames(s, dir)
    cellsB.select(col("cell_id"), col("cd").cast("array<bigint>").as("c"))
      .coalesce(1).write.mode("overwrite").parquet(path + "/cells")
    cb.select(col("cid"), col("s"), col("cv").cast("array<bigint>").as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(path + "/codebook")
  }
}
