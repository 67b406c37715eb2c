package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 invariants the oracle hashes can't articulate:
  *
  *  - The hardened JPEG marker walk (MediaBlobs.decodeCodecDims):
  *    tolerates legal 0xFF fill padding and standalone RSTn/TEM
  *    markers between header segments (ITU T.81 §B.1.1.2 — the JDK
  *    encoder never emits them, external bytes may), still decodes
  *    ImageIO re-encoded variants, and routes DESYNCED payloads
  *    (non-0xFF where a marker must start, truncation mid-segment,
  *    scan-before-frame) to the jpeg-sentinel quarantine row instead
  *    of emitting garbage dims.
  */
class Round14OpsSpec extends AnyFunSuite {
  import SparkTestBase._

  // ---- hardened JPEG marker walk ----

  /** Byte-splice `ins` into `p` right after the APP0 segment (the
    * first inter-segment boundary of every JDK-encoded JFIF).
    */
  private def spliceAfterApp0(p: Array[Byte], ins: Array[Byte]): Array[Byte] = {
    require((p(2) & 0xFF) == 0xFF && (p(3) & 0xFF) == 0xE0, "not a JFIF")
    val app0Len = ((p(4) & 0xFF) << 8) | (p(5) & 0xFF)
    val cut = 2 + 2 + app0Len
    p.slice(0, cut) ++ ins ++ p.slice(cut, p.length)
  }

  private def decodeOne(p: Array[Byte]): org.apache.spark.sql.Row = {
    import spark.implicits._
    sources.MediaBlobs.decodeCodecDims(
      Seq((1L, p)).toDF("doc_id", "payload")).head()
  }

  test("JPEG walk tolerates 0xFF fill bytes and RSTn/TEM between segments") {
    val base = sources.MediaBlobs.codecBlobFor(0L) // JPEG, 200x2
    val clean = decodeOne(base)
    assert(clean.getString(1) === "jpeg" && clean.getLong(3) === 200L &&
      clean.getLong(4) === 2L)
    // legal inter-segment padding: a run of 0xFF fill bytes
    val fill = spliceAfterApp0(base, Array.fill[Byte](5)(0xFF.toByte))
    assert(decodeOne(fill).toSeq === clean.toSeq, "fill bytes broke the walk")
    // standalone markers with no length field: RST0 and TEM
    val rst = spliceAfterApp0(base,
      Array(0xFF.toByte, 0xD0.toByte, 0xFF.toByte, 0x01.toByte))
    assert(decodeOne(rst).toSeq === clean.toSeq, "RSTn/TEM broke the walk")
    // both at once, fill bytes directly before a standalone marker
    val both = spliceAfterApp0(base,
      Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xD3.toByte))
    assert(decodeOne(both).toSeq === clean.toSeq)
  }

  test("JPEG walk quarantines desynced payloads instead of emitting garbage") {
    val base = sources.MediaBlobs.codecBlobFor(0L)
    def isJpegSentinel(r: org.apache.spark.sql.Row): Boolean =
      r.getString(1) == "jpeg" && r.isNullAt(2) &&
        r.getLong(3) == -1L && r.getLong(4) == -1L
    // a stray non-0xFF byte where a marker must start (valid SOI kept)
    val stray = spliceAfterApp0(base, Array(0x12.toByte, 0x34.toByte))
    assert(isJpegSentinel(decodeOne(stray)),
      "desynced walk emitted dims instead of the sentinel row")
    // truncated mid-header: SOI + the APP0 prefix only
    assert(isJpegSentinel(decodeOne(base.slice(0, 8))))
    // an SOS marker before any SOF (scan with no frame header)
    val sos = (base.slice(0, 2) :+ 0xFF.toByte :+ 0xDA.toByte) ++
      Array[Byte](0, 4, 1, 0)
    assert(isJpegSentinel(decodeOne(sos)))
    // a zero segment length can't loop forever — quarantined
    val zeroLen = spliceAfterApp0(base,
      Array(0xFF.toByte, 0xFE.toByte, 0x00.toByte, 0x00.toByte))
    assert(isJpegSentinel(decodeOne(zeroLen)))
  }

  test("JPEG walk decodes ImageIO re-encoded variants (property over seeds)") {
    // re-encoding through a second ImageIO round-trip rearranges the
    // header segments (different APPn/DQT layout than the generator's
    // one-shot write) — the walk must still find the SOF
    for (g <- Seq(0L, 2L, 4L, 12L, 40L)) {
      val base = sources.MediaBlobs.codecBlobFor(g)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      val r = decodeOne(out.toByteArray)
      assert(r.getString(1) === "jpeg")
      assert(r.getLong(3) === img.getWidth.toLong &&
        r.getLong(4) === img.getHeight.toLong,
        s"seed $g: re-encoded dims diverge")
    }
  }

  // ---- cross-modal joint-embedding space ----

  test("image tower from REAL bytes equals an independent formula recompute") {
    // scalar Scala replay of the generator contract — no shared code
    // with MediaBlobs.imageFeatOne (which parses the actual container)
    def formulaFeat(g: Long): Array[Long] = {
      val w = (200 + (g * 13) % 800).toInt
      val h = (2 + g % 5).toInt
      val gr = (0 until 64).map { k =>
        val sx = (k % 8) * w / 8
        val sy = (k / 8) * h / 8
        (0 until 3).map(c => (sx + 7L * sy + 11 * c + g) % 251).sum
      }
      val total = gr.sum
      gr.map(x => 64 * x - total).toArray
    }
    import spark.implicits._
    val gs = (0L until 41L by 2).toSeq // all BMP seeds
    val blobs = gs.map(g => (g, sources.MediaBlobs.blobFor(g)))
      .toDF("doc_id", "payload")
    val got = sources.MediaBlobs.imageEmbFromBytes(blobs)
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]](1).toArray).toMap
    assert(got.keySet === gs.toSet)
    gs.foreach { g =>
      assert(java.util.Arrays.equals(got(g), formulaFeat(g)),
        s"seed $g: byte-decoded feature diverges from the contract")
    }
    // PNG seeds must be skipped, not garbled
    val png = Seq((1L, sources.MediaBlobs.blobFor(1L)))
      .toDF("doc_id", "payload")
    assert(sources.MediaBlobs.imageEmbFromBytes(png).count() === 0L)
  }

  test("image tower centering is brightness-invariant (the joint-space contract)") {
    // +4 per channel shifts every grid gray by exactly +12 (generator
    // pixels are <= 250, so nothing saturates); zero-sum centering must
    // cancel it exactly — the same invariance dHash gets from
    // gradients, kept EXACT here so the oracle replays it
    val g = 4L
    val f0 = sources.MediaBlobs.imageFeatOne(
      sources.MediaBlobs.blobFor(g)).get
    val w = (200 + (g * 13) % 800).toInt
    val h = (2 + g % 5).toInt
    val bright = sources.MediaBlobs.bmp24(w, h,
      (x, y, c) => (((x + 7 * y + 11 * c + g) % 251) + 4).toByte)
    val fB = sources.MediaBlobs.imageFeatOne(bright).get
    assert(java.util.Arrays.equals(f0, fB),
      "centered features changed under a uniform brightness shift")
  }

  test("cross-modal retrieval: same-content images tie, store is reused") {
    val rows = SparkEntry.queries("q_crossmodal_topk")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rank-1 and rank-2 per query: if they share a seed (doc_id % 41)
    // they must score identically (payloads byte-identical)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val bySeed = rs.groupBy(_.getLong(2) % 41)
      bySeed.values.foreach { same =>
        assert(same.map(_.getDouble(3)).distinct.length === 1,
          "same image content scored differently in the shared space")
      }
    }
    // store reuse: second run must not rewrite the artifact. Snapshot
    // only THIS sfDir's content-tagged store (computed the same way
    // ensureImageEmbStore does) — not every graft_imgemb_* in tmpdir,
    // which races with other suites / concurrent sbt sessions.
    val store = new java.io.File(
      System.getProperty("java.io.tmpdir") + "/graft_imgemb_" +
        sfDir.replaceAll("[^0-9a-zA-Z]", "_") + "_" +
        graft.T.contentTag(sfDir, "documents"))
    assert(store.isDirectory)
    val before = store.listFiles().map(f => f.getPath -> f.lastModified).toMap
    SparkEntry.queries("q_crossmodal_topk")(spark, sfDir).collect()
    val after = store.listFiles().map(f => f.getPath -> f.lastModified).toMap
    assert(before === after, "image-embedding store was rebuilt")
  }

  test("IVF-routed cross-modal answers match brute force on rank 1") {
    // the nprobe=2 route is exact here whenever the true top-1's cell
    // is probed; verify the IVF answer never BEATS brute force and
    // agrees on cos whenever it picks the same candidate
    val bf = SparkEntry.queries("q_crossmodal_topk")(spark, sfDir)
      .filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ivf = SparkEntry.queries("q_crossmodal_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(ivf.map(_._1).toSet === bf.keySet)
    ivf.foreach { case (q, cand, cos) =>
      val (bfCand, bfCos) = bf(q)
      assert(cos <= bfCos + 1e-9, s"q$q: IVF cos exceeds brute force")
      if (cand == bfCand) assert(math.abs(cos - bfCos) < 1e-9)
    }
  }

  // ---- delta-append maintenance of the persisted artifacts ----

  test("delta-appended IVF-PQ index is row-identical to a from-scratch rebuild") {
    val full = sources.IvfPqIndex.ensure(spark, sfDir)
    val inc = sources.IvfPqIndex.ensureIncremental(spark, sfDir)
    def codesOf(p: String) = spark.read.parquet(p + "/codes")
      .selectExpr("vec_id", "cast(cell_id as long) cell_id",
        "concat_ws(',', codes) cs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val f = codesOf(full)
    val i = codesOf(inc)
    assert(f === i, "base+delta codes diverge from the full rebuild")
    // the delta actually contributed: batch vec_ids are present
    assert(i.exists(_._1 % 10 == 7), "no batch rows in the appended index")
    // frozen model tables identical
    def modelOf(p: String, t: String, cols: Seq[String]) = spark.read
      .parquet(s"$p/$t").selectExpr(cols: _*)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(modelOf(full, "cells", Seq("cell_id", "concat_ws(',', c)")) ===
      modelOf(inc, "cells", Seq("cell_id", "concat_ws(',', c)")))
    assert(modelOf(full, "codebook", Seq("cid", "s", "concat_ws(',', cv)")) ===
      modelOf(inc, "codebook", Seq("cid", "s", "concat_ws(',', cv)")))
    // and the search over the appended index answers identically
    val a = SparkEntry.queries("q_ann_ivfpq_index")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q_ann_ivfpq_delta")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a === b, "search answers differ across maintenance modes")
  }

  test("delta-appended bitmap rollup is blob-identical to a from-scratch rebuild") {
    val full = queries.Aggregates.ensureBitmapRollup(spark, sfDir)
    val inc = queries.Aggregates.ensureBitmapRollupIncremental(spark, sfDir)
    def blobsOf(p: String) = spark.read.parquet(p)
      .selectExpr("event_type", "cast(day as string) day", "bucket",
        "md5(bm) h")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    val f = blobsOf(full)
    val i = blobsOf(inc)
    assert(f === i, "base+delta rollup blobs diverge from the full rebuild")
    // the appended day partition exists as its own directory
    val maxDay = f.map(_._2).max
    assert(new java.io.File(inc, s"day=$maxDay").isDirectory,
      "newest day was not appended as a partition directory")
    // build-once: a second ensure call must not rewrite anything
    val files = new java.io.File(inc).listFiles()
      .map(x => x.getPath -> x.lastModified).toMap
    queries.Aggregates.ensureBitmapRollupIncremental(spark, sfDir)
    val after = new java.io.File(inc).listFiles()
      .map(x => x.getPath -> x.lastModified).toMap
    assert(files === after, "incremental rollup was rebuilt on reuse")
  }

  // ---- LSH index cap accounting (no-silent-caps) ----

  test("LSH index build records its bucket-cap truncation in a sidecar") {
    // Scope strictly to THIS suite's content-tagged artifact (computed
    // the same way ensureLshIndex does) — a tmpdir-wide glob would
    // clobber memoized stores other suites or a concurrent sbt session
    // rely on, and is ordering-sensitive under parallel execution.
    val base = "graft_lshidx_" + sfDir.replaceAll("[^0-9a-zA-Z]", "_") +
      "_" + graft.T.contentTag(sfDir, "documents")
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val idx = new java.io.File(tmp, base)
    val cap = new java.io.File(tmp,
      base.replace("graft_lshidx_", "graft_lshcap_") + ".json")
    // force a fresh build: drop this sfDir's memoized index + sidecar
    def rm(x: java.io.File): Unit = if (x.exists()) {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    rm(idx); rm(cap)
    SparkEntry.queries("q_dedup_incremental_neardup")(spark, sfDir).collect()
    assert(cap.isFile, "cap-accounting sidecar missing")
    val txt = new String(java.nio.file.Files.readAllBytes(
      cap.toPath), "UTF-8")
    assert(txt.contains("\"cap\": 1000") &&
      txt.contains("capped_buckets") && txt.contains("dropped_postings"))
  }
}
