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

  // ---- LSH index cap accounting (no-silent-caps) ----

  test("LSH index build records its bucket-cap truncation in a sidecar") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    // force a fresh build: drop any memoized index + sidecar first
    tmp.listFiles().filter(f => f.getName.startsWith("graft_lshidx_") ||
        f.getName.startsWith("graft_lshcap_"))
      .foreach { f =>
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm)
          x.delete()
        }
        rm(f)
      }
    SparkEntry.queries("q_dedup_incremental_neardup")(spark, sfDir).collect()
    val metas = tmp.listFiles().filter(_.getName.startsWith("graft_lshcap_"))
    assert(metas.nonEmpty, "cap-accounting sidecar missing")
    val txt = new String(java.nio.file.Files.readAllBytes(
      metas.head.toPath), "UTF-8")
    assert(txt.contains("\"cap\": 1000") &&
      txt.contains("capped_buckets") && txt.contains("dropped_postings"))
  }
}
