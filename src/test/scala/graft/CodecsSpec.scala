package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Codecs

/** Real-codec gates: G.711 μ-law, IMA ADPCM, animated GIF. Each test
  * proves a property the DuckDB oracle relies on, independently of the
  * oracle (exhaustive domain sweeps and hand replays, not SQL). */
class CodecsSpec extends AnyFunSuite {

  test("mu-law: exhaustive 16-bit sweep matches the oracle's integer formula") {
    // The oracle's CASE-chain replay of compress→expand, written
    // independently here: any drift between codec and oracle shows up
    // on one of the 65536 inputs.
    def oracleDec(x: Int): Int = {
      val sgn = if (x < 0) -1 else 1
      val s = math.min(math.abs(x), 32635) + 132
      val e =
        if (s >= 16384) 7 else if (s >= 8192) 6 else if (s >= 4096) 5
        else if (s >= 2048) 4 else if (s >= 1024) 3 else if (s >= 512) 2
        else if (s >= 256) 1 else 0
      val m = (s / (1 << (e + 3))) % 16
      sgn * ((m * 8 + 132) * (1 << e) - 132)
    }
    var x = -32768
    while (x <= 32767) {
      val dec = Codecs.ulawDecode(Codecs.ulawEncode(x))
      assert(dec == oracleDec(x), s"x=$x codec=$dec oracle=${oracleDec(x)}")
      x += 1
    }
  }

  test("mu-law: quantization error bounded by the segment step size") {
    var x = -32635
    while (x <= 32635) {
      val dec = Codecs.ulawDecode(Codecs.ulawEncode(x))
      val s = math.abs(x) + 132
      val e =
        if (s >= 16384) 7 else if (s >= 8192) 6 else if (s >= 4096) 5
        else if (s >= 2048) 4 else if (s >= 1024) 3 else if (s >= 512) 2
        else if (s >= 256) 1 else 0
      assert(math.abs(dec - x) < (1 << (e + 3)),
        s"x=$x dec=$dec step=${1 << (e + 3)}")
      // sign is always preserved (two μ-law zeros both decode to 0)
      assert(dec == 0 || math.signum(dec) == math.signum(x))
      x += 7
    }
  }

  test("RIFF walk: JUNK chunk skipped, fmt parsed, bad magic rejected") {
    val wav = Codecs.encodeWavUlaw(5L)
    val chunks = Codecs.riffChunks(wav)
    assert(chunks.keySet == Set("fmt ", "JUNK", "data"))
    val (rate, n, _, _, peak) = Codecs.decodeWavUlaw(wav)
    assert(rate == Codecs.ULAW_RATE && n == Codecs.ULAW_N)
    assert(peak > 0 && peak <= 32124) // μ-law's maximum decode magnitude
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Codecs.riffChunks(bad))
  }

  test("ADPCM: container decode equals a direct nibble replay; header sign-extends") {
    for (id <- Seq(0L, 3L, 7L, 42L, 119L)) {
      val xs = Array.tabulate(Codecs.ADPCM_N)(i => Codecs.adpcmSample(id, i))
      // independent replay: run the decoder recurrence straight off the
      // encoder's nibble stream, bypassing the WAV container entirely
      val nibbles = Codecs.adpcmEncodeNibbles(xs)
      var pred = xs(0); var idx = 0
      val replay = new Array[Int](Codecs.ADPCM_N)
      replay(0) = pred
      for (i <- 1 until Codecs.ADPCM_N) {
        val nib = nibbles(i - 1)
        val step = Codecs.StepTable(idx)
        val delta = nib & 7
        var vp = step >> 3
        if ((delta & 4) != 0) vp += step
        if ((delta & 2) != 0) vp += step >> 1
        if ((delta & 1) != 0) vp += step >> 2
        val raw = if ((nib & 8) != 0) pred - vp else pred + vp
        pred = math.max(-32768, math.min(32767, raw))
        idx = math.max(0, math.min(88, idx + Codecs.IndexTable(delta)))
        replay(i) = pred
      }
      val dec = Codecs.decodeWavAdpcm(Codecs.encodeWavAdpcm(id))
      assert(dec.sameElements(replay), s"id=$id container != nibble replay")
      assert(dec(0) == xs(0), s"id=$id header predictor ${dec(0)} != ${xs(0)}")
    }
    // at least one clip must start negative, or the sign-extension
    // branch in the header read is untested
    assert((0L until Codecs.ADPCM_DOCS)
      .exists(id => Codecs.adpcmSample(id, 0) < 0))
  }

  test("ADPCM: decoder tracks a slow ramp closely (codec sanity, not identity)") {
    // For a gentle signal the 4-bit codec should track within a few
    // steps — a decode that ignores the nibbles cannot do this.
    val xs = Array.tabulate(64)(i => i * 40)
    val nibbles = Codecs.adpcmEncodeNibbles(xs)
    var pred = xs(0); var idx = 0
    var maxErr = 0
    for (i <- 1 until xs.length) {
      val nib = nibbles(i - 1)
      val step = Codecs.StepTable(idx)
      val delta = nib & 7
      var vp = step >> 3
      if ((delta & 4) != 0) vp += step
      if ((delta & 2) != 0) vp += step >> 1
      if ((delta & 1) != 0) vp += step >> 2
      pred = math.max(-32768, math.min(32767, if ((nib & 8) != 0) pred - vp else pred + vp))
      idx = math.max(0, math.min(88, idx + Codecs.IndexTable(delta)))
      maxErr = math.max(maxErr, math.abs(pred - xs(i)))
    }
    assert(maxErr < 200, s"ramp tracking error $maxErr")
  }

  test("gzip: DEFLATE round trip, trailer CRC32/ISIZE validated, corruption rejected") {
    val raw = ("the quick brown fox " * 40).getBytes("UTF-8")
    val gz = Codecs.gzipBytes(raw)
    assert(gz.length < raw.length, "DEFLATE must actually compress repetitive text")
    assert(Codecs.gunzipChecked(gz).sameElements(raw))
    // flip one bit in the trailer CRC → the decode must throw (the JDK
    // stream verifies the trailer itself and raises ZipException before
    // our belt-and-braces require can)
    val badCrc = gz.clone(); badCrc(gz.length - 6) = (badCrc(gz.length - 6) ^ 1).toByte
    val ex = intercept[Exception](Codecs.gunzipChecked(badCrc))
    assert(ex.isInstanceOf[java.util.zip.ZipException] ||
      ex.isInstanceOf[IllegalArgumentException], s"unexpected: $ex")
    // truncate the magic → rejected before inflate
    val badMagic = gz.clone(); badMagic(0) = 0
    intercept[IllegalArgumentException](Codecs.gunzipChecked(badMagic))
    // empty input round-trips too (zero-length member)
    assert(Codecs.gunzipChecked(Codecs.gzipBytes(Array.empty[Byte])).isEmpty)
  }

  test("GIF: multi-frame round trip is pixel-exact and order-preserving") {
    for (id <- Seq(0L, 1L, 13L, 99L)) {
      val (fmt, n, w, h, pix, ord) = Codecs.decodeGif(Codecs.encodeGif(id))
      val (ew, eh) = Codecs.gifDims(id)
      assert(fmt == "gif" && n == Codecs.GIF_FRAMES)
      assert(w == ew && h == eh, s"id=$id dims ($w,$h) != ($ew,$eh)")
      var ePix = 0L; var eOrd = 0L
      for (f <- 0 until Codecs.GIF_FRAMES) {
        var fs = 0L
        for (y <- 0 until eh; x <- 0 until ew) fs += Codecs.gifPixel(id, f, x, y)
        ePix += fs; eOrd += (f + 1) * fs
      }
      assert(pix == ePix, s"id=$id pix_sum $pix != $ePix")
      assert(ord == eOrd, s"id=$id ord_sum $ord != $eOrd")
    }
    // full per-pixel equality on one clip, frame by frame, straight
    // through ImageIO (not just checksums)
    val id = 7L
    val bytes = Codecs.encodeGif(id)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val (w, h) = Codecs.gifDims(id)
    for (f <- 0 until Codecs.GIF_FRAMES) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xff) == Codecs.gifPixel(id, f, x, y),
          s"frame $f pixel ($x,$y)")
    }
    reader.dispose(); iis.close()
  }

  test("JPEG: sniffs as jpeg, dims exact, error inside tolerance, lossy somewhere") {
    var totErr = 0L
    for (id <- 0L until 64L) {
      val payload = Codecs.encodeJpeg(id)
      // SOI marker: a real JPEG stream, not a renamed lossless one
      assert((payload(0) & 0xff) == 0xd8 - 0x10 + 0x10 - 0 + 0xff - 0xff + 0xff
        || (payload(0) & 0xff) == 0xff)
      assert((payload(1) & 0xff) == 0xd8)
      val (fmt, img) = Codecs.decodeJpegRaster(payload)
      assert(fmt == "jpeg", s"id=$id sniffed $fmt")
      val (w, h) = Codecs.jpegDims(id)
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val dec = (img.getRGB(x, y) >> (16 - 8 * c)) & 0xff
        val err = math.abs(dec - Codecs.jpegPlanted(id, x, y, c))
        totErr += err
        maxErr = math.max(maxErr, err)
      }
      assert(maxErr <= Codecs.JPEG_MAXERR_MAX, s"id=$id maxErr=$maxErr")
    }
    // lossy evidence: if every image round-tripped exactly, the decode
    // is NOT going through JPEG quantization
    assert(totErr > 0, "zero total error across 64 images - not lossy")
  }

  test("JPEG: committed golden class table matches the real decode for all 576 classes") {
    // q303's oracle replays JPEG_GOLDEN_PACKED in DuckDB; this re-derives
    // every class from the real encode+decode so codec drift (a JDK bump
    // changing the quantization tables) fails HERE, not at the driver's
    // hash gate. doc_id mod 576 (lcm of the 9-cycle dims and 64-cycle
    // base level) fully determines the raster, hence the stats.
    assert(Codecs.jpegGolden.length == 576)
    for (cls <- 0L until 576L) {
      val payload = Codecs.encodeJpeg(cls)
      val (fmt, img) = Codecs.decodeJpegRaster(payload)
      val (w, h) = Codecs.jpegDims(cls)
      assert(fmt == "jpeg" && img.getWidth == w && img.getHeight == h)
      var sumErr = 0L
      var maxErr = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val dec = (img.getRGB(x, y) >> (16 - 8 * c)) & 0xff
        val err = math.abs(dec - Codecs.jpegPlanted(cls, x, y, c)).toLong
        sumErr += err
        maxErr = math.max(maxErr, err)
      }
      val expect = (payload.length.toLong, sumErr * 1000L / (3L * w * h), maxErr)
      assert(Codecs.jpegGolden(cls.toInt) == expect,
        s"class $cls: golden ${Codecs.jpegGolden(cls.toInt)} vs derived $expect")
    }
  }

  test("JPEG: planted corruption schedule - truncation and entropy bit flips detected") {
    val payload = Codecs.encodeJpeg(7L)
    // (a) truncation: reader must fail, not return a fabricated raster
    val truncated = payload.take(payload.length / 2)
    assert(scala.util.Try(Codecs.decodeJpegRaster(truncated)).isFailure,
      "truncated stream decoded 'successfully'")
    // (b) header corruption: break the SOI magic - sniffing must fail
    val badMagic = payload.clone(); badMagic(1) = 0x00
    assert(scala.util.Try(Codecs.decodeJpegRaster(badMagic)).isFailure,
      "corrupted magic still recognized")
    // (c) entropy-segment bit flips: decode either fails or yields a
    // DIFFERENT raster than the intact stream (the bytes are load-
    // bearing). Flip bits late in the stream, well past the tables.
    val (_, ref) = Codecs.decodeJpegRaster(payload)
    def checksum(img: java.awt.image.BufferedImage): Long = {
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        s = s * 31 + (img.getRGB(x, y) & 0xffffff)
      s
    }
    val refSum = checksum(ref)
    val flips = (1 to 8).map(k => payload.length - 3 - k * 7)
    val detected = flips.count { pos =>
      val mutated = payload.clone()
      mutated(pos) = (mutated(pos) ^ 0x55).toByte
      scala.util.Try(Codecs.decodeJpegRaster(mutated)) match {
        case scala.util.Failure(_) => true
        case scala.util.Success((_, img)) => checksum(img) != refSum
      }
    }
    assert(detected > 0,
      "no entropy-coded byte flip changed the decode - payload bytes are not load-bearing")
  }
}
