package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property-level proof that the media generators are correct over the
  * FULL formula domain, not just the 41 seeds the store materializes:
  * for arbitrary g, the emitted bytes must be accepted by the JDK's
  * independent parsers (ImageIO for BMP/PNG, AudioSystem for WAV) with
  * exactly the dims/format the generator contract prescribes — the
  * same contract the DuckDB oracles replay. No Spark session needed;
  * this is a pure byte-level law.
  */
object MediaBlobsPropertySpec extends Properties("MediaBlobsLaws") {
  import sources.MediaBlobs

  private val seeds = Gen.chooseNum(0L, 9999L)

  property("image blobs parse identically for arbitrary seeds") =
    Prop.forAllNoShrink(seeds) { (g: Long) =>
      val bytes = MediaBlobs.blobFor(g)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val w = (200 + (g * 13) % 800).toInt
      val h = (2 + g % 5).toInt
      val sizeOk = g % 2 != 0 || {
        val rowSize = ((3 * w + 3) / 4) * 4 // BMP exact size formula
        bytes.length == 54 + rowSize * h
      }
      img != null && img.getWidth == w && img.getHeight == h && sizeOk &&
        // corner pixel round-trips through the independent decoder
        img.getRaster.getSample(0, 0, 0) == (g % 251).toInt
    }

  property("wav blobs parse identically for arbitrary seeds") =
    Prop.forAllNoShrink(seeds) { (g: Long) =>
      val bytes = MediaBlobs.wavFor(g)
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      val nf = (50 + (g * 7) % 200).toInt
      val ch = (1 + g % 2).toInt
      f.getChannels == ch &&
        f.getSampleRate.toInt ==
          Array(8000, 16000, 22050, 44100)((g % 4).toInt) &&
        aff.getFrameLength == nf &&
        bytes.length == 44 + nf * ch * 2
    }

  /** Independent structural walk of a Y4M stream, written from the
    * mjpegtools spec rather than from the generator: parse the ASCII
    * header line, then require a "FRAME\n" marker at every computed
    * frame offset, the exact total length, and the contract's pixel
    * value at each frame's corners. No JDK Y4M parser exists, so this
    * walk IS the third-party check (it shares no code with y4mFor).
    */
  property("y4m blobs walk cleanly for arbitrary seeds") =
    Prop.forAllNoShrink(seeds) { (g: Long) =>
      val p = MediaBlobs.y4mFor(g)
      val nl = p.indexOf('\n'.toByte)
      val hdr = new String(p, 0, nl, "US-ASCII")
      val re = "^YUV4MPEG2 W(\\d+) H(\\d+) F(\\d+):(\\d+) Ip A1:1 C(\\w+)$".r
      hdr match {
        case re(ws, hs, fn, fd, cs) =>
          val (w, h) = (ws.toInt, hs.toInt)
          val frameBytes = 6 + w * h
          val nf = (p.length - nl - 1) / frameBytes
          val expectW = (16 + (g * 5) % 48).toInt
          val expectNf = (4 + (g * 3) % 12).toInt
          val markersOk = (0 until nf).forall { t =>
            val off = nl + 1 + t * frameBytes
            new String(p, off, 6, "US-ASCII") == "FRAME\n" && {
              val corner = p(off + 6) & 0xFF // pixel (0, 0, t)
              corner == ((5 * t + g) % 251).toInt
            }
          }
          w == expectW && h == (8 + g % 8).toInt &&
            fn.toInt == Array(24, 25, 30, 60)((g % 4).toInt) &&
            fd == "1" && cs == "mono" && nf == expectNf &&
            p.length == nl + 1 + nf * frameBytes && markersOk
        case _ => false
      }
    }

  property("codec blobs parse identically for arbitrary seeds") =
    Prop.forAllNoShrink(seeds) { (g: Long) =>
      val bytes = MediaBlobs.codecBlobFor(g)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val w = (200 + (g * 13) % 800).toInt
      val h = (2 + g % 5).toInt
      val magicOk =
        if (g % 2 == 0) (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
        else new String(bytes, 0, 6, "US-ASCII") == "GIF89a"
      img != null && img.getWidth == w && img.getHeight == h && magicOk
    }

  property("distinct store seeds yield distinct payloads (dedup law)") = {
    def b64(a: Array[Byte]) =
      java.util.Base64.getEncoder.encodeToString(a)
    val imgs = (0L until MediaBlobs.seedMod).map(g => b64(MediaBlobs.blobFor(g)))
    val wavs = (0L until MediaBlobs.seedMod).map(g => b64(MediaBlobs.wavFor(g)))
    val vids = (0L until MediaBlobs.seedMod).map(g => b64(MediaBlobs.y4mFor(g)))
    Prop.propBoolean(
      imgs.distinct.length == imgs.length &&
        wavs.distinct.length == wavs.length &&
        vids.distinct.length == vids.length)
  }
}
