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
  * 100 TB shape: the index build is one corpus pass (broadcast cells +
  * codebook, no corpus shuffle except the partitioned write); the
  * search reads nprobe/nlist of the CODE table (bytes, not floats),
  * with the cell routing decided driver-side from the model tables —
  * exactly how a production ANN service schedules probes.
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

  /** Build (memoized) and return the index root path. */
  def ensure(s: SparkSession, dir: String): String = {
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivfpq_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
      graft.T.contentTag(dir, "embeddings")
    val done = new java.io.File(path + "/codes", "_SUCCESS")
    if (!done.exists()) build(s, dir, path)
    path
  }

  private def build(s: SparkSession, dir: String, path: String): Unit = {
    val emb = quantized(s, dir)
    val cellsB = broadcast(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell_id"), col("qd").as("cd"),
        col("en").as("cn")))
    val corp = emb.filter(col("vec_id") >= 9)
    // coarse assignment + residual (the q_ann_ivfpq pipeline)
    val res = corp.crossJoin(cellsB)
      .withColumn("d",
        (col("en") + col("cn") - lit(2) * dot("qd", "cd")).cast("long"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cell_id"), col("cd"))).as("best"),
        first(col("qd")).as("qd"))
      .select(col("vec_id"), col("best.cell_id").as("cell_id"),
        expr("zip_with(qd, best.cd, (a, b) -> a - b)").as("rd"))
    val cb = broadcast(
      slices(res.filter(col("vec_id") >= 9 && col("vec_id") < 13),
        "rd", "vec_id")
        .select((col("vec_id") - 9).cast("int").as("cid"), col("s"),
          col("v").as("cv"), col("vn").as("cvn")))
    val codes = slices(res, "rd", "vec_id", "cell_id")
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
    // model tables first, the partitioned code table last — its
    // _SUCCESS is the completion gate (the HBase-slice lesson: gate on
    // whatever is written LAST).
    cellsB.select(col("cell_id"), col("cd").cast("array<bigint>").as("c"))
      .coalesce(1).write.mode("overwrite").parquet(path + "/cells")
    cb.select(col("cid"), col("s"), col("cv").cast("array<bigint>").as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(path + "/codebook")
    codes.write.mode("overwrite").partitionBy("cell_id")
      .parquet(path + "/codes")
  }
}
