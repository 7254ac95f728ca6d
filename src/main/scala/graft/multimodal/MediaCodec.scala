package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Dependency-free pure-JVM media codecs for three trivial containers —
  * BMP (24-bit uncompressed), binary PPM (P6), and PCM WAV — the first
  * REAL `decode` behind the multimodal seam (this environment ships no
  * image/audio libraries, so the containers are ones whose byte layout a
  * few dozen lines parse exactly; a production deployment swaps in
  * JNI/codecs at the same [[decode]] signature).
  *
  * Decode FAILS LOUDLY: an unrecognized magic, a truncated header, an
  * out-of-range dimension, or a payload whose length contradicts its
  * header throws `IllegalArgumentException` with the reason — a corrupt
  * blob must fail the job, not emit garbage metadata (the same fail-loud
  * contract as the vector kernels).
  *
  * [[MediaMeta]] semantics per container:
  *  - BMP/PPM: (width, height, channels=3, nFrames=1, sizeBytes)
  *  - WAV: width=height=0 (no raster), channels = channel count,
  *    nFrames = PCM sample FRAMES in the data chunk, sizeBytes
  *
  * The encoders exist for fixture planting (valid files with closed-form
  * sizes — the oracle computes the same values from the id without
  * parsing) and for the round-trip specs; they write exactly the layout
  * the decoders parse.
  */
object MediaCodec {

  import Multimodal.MediaMeta

  /** BMP: "BM" + 54-byte header, 24bpp, BI_RGB, rows bottom-up padded to
    * 4 bytes. */
  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 1024 && height <= 1024)
    val rowBytes = (3 * width + 3) / 4 * 4
    val size = 54 + rowBytes * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(size)          // file size
    b.putInt(0)             // reserved
    b.putInt(54)            // pixel data offset
    b.putInt(40)            // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height)
    b.putShort(1)           // planes
    b.putShort(24)          // bpp
    b.putInt(0)             // BI_RGB
    b.putInt(rowBytes * height)
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(0).putInt(0)   // palette
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed + y * width + x
        b.put((v & 0xFF).toByte)
        b.put(((v >> 3) & 0xFF).toByte)
        b.put(((v >> 6) & 0xFF).toByte)
        x += 1
      }
      var p = 3 * width
      while (p < rowBytes) { b.put(0.toByte); p += 1 }
      y += 1
    }
    b.array()
  }

  /** Closed-form [[encodeBmp]] payload size — the oracle's mirror. */
  def bmpSize(width: Int, height: Int): Long =
    54L + (3L * width + 3) / 4 * 4 * height

  /** Binary PPM: "P6\n{w} {h}\n255\n" + 3wh pixel bytes. */
  def encodePpm(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 1024 && height <= 1024)
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < 3 * width * height) {
      out(header.length + i) = ((seed + i * 31) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Closed-form [[encodePpm]] payload size: 9 header bytes + the
    * dimension digits + 3wh. */
  def ppmSize(width: Int, height: Int): Long =
    9L + width.toString.length + height.toString.length + 3L * width * height

  /** PCM WAV: canonical 44-byte RIFF/WAVE header + 16-bit samples. */
  def encodeWav(channels: Int, nFrames: Int, sampleRate: Int,
      seed: Long): Array[Byte] = {
    require(channels > 0 && channels <= 8 && nFrames > 0 && sampleRate > 0)
    val blockAlign = channels * 2
    val dataBytes = nFrames * blockAlign
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    b.putInt(36 + dataBytes)
    b.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    b.putInt(16)            // fmt chunk size
    b.putShort(1)           // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign)
    b.putShort(blockAlign.toShort)
    b.putShort(16)          // bits per sample
    b.put("data".getBytes(StandardCharsets.US_ASCII))
    b.putInt(dataBytes)
    var i = 0
    while (i < nFrames * channels) {
      b.putShort(((seed + i * 17) & 0xFFFF).toShort)
      i += 1
    }
    b.array()
  }

  /** Closed-form [[encodeWav]] payload size. */
  def wavSize(channels: Int, nFrames: Int): Long =
    44L + nFrames.toLong * channels * 2

  private def fail(reason: String): Nothing =
    throw new IllegalArgumentException(s"media decode failed: $reason")

  /** Decoded grayscale raster: (width, height, row-major TOP-DOWN gray
    * values). Integer luma `(299·r + 587·g + 114·b) / 1000` per pixel.
    * Rasters only — BMP rows are stored bottom-up and get flipped here;
    * a WAV (or any non-raster payload) fails loudly like [[decode]]. */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    if (payload == null || payload.length < 2) fail("payload shorter than any magic")
    if (payload(0) == 'B' && payload(1) == 'M') {
      val m = decodeBmp(payload) // header + length validation
      val w = m.width; val h = m.height
      val off = le32(payload, 10)
      val rowBytes = ((3L * w + 3) / 4 * 4).toInt
      val gray = new Array[Int](w * h)
      var j = 0
      while (j < h) {
        val y = h - 1 - j // bottom-up storage → top-down raster
        var x = 0
        while (x < w) {
          val p = off + j * rowBytes + 3 * x
          val b = payload(p) & 0xFF
          val g = payload(p + 1) & 0xFF
          val r = payload(p + 2) & 0xFF
          gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        j += 1
      }
      (w, h, gray)
    } else if (payload(0) == 'P' && payload(1) == '6') {
      val m = decodePpm(payload)
      val w = m.width; val h = m.height
      // re-walk the header to find the raster offset (decodePpm validated it)
      var i = 2
      var tokens = 0
      while (tokens < 3) {
        while (Character.isWhitespace(payload(i))) i += 1
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') i += 1
        tokens += 1
      }
      i += 1 // the single raster separator
      val gray = new Array[Int](w * h)
      var p = 0
      while (p < w * h) {
        val r = payload(i + 3 * p) & 0xFF
        val g = payload(i + 3 * p + 1) & 0xFF
        val b = payload(i + 3 * p + 2) & 0xFF
        gray(p) = (299 * r + 587 * g + 114 * b) / 1000
        p += 1
      }
      (w, h, gray)
    } else fail("grayscale decode requires a raster container (BMP or PPM)")
  }

  /** Difference hash (dHash — the standard perceptual-hash family member
    * for near-duplicate images): point-sample the gray raster on a 9×8
    * grid (sx = x·w/9, sy = y·h/8 — integer floors, valid in both up- and
    * down-scale directions) and set bit y·8+x iff grid(x,y) > grid(x+1,y).
    * Near-identical images differ in few bits; Hamming distance is the
    * dissimilarity. */
  def dhash64(width: Int, height: Int, gray: Array[Int]): Long = {
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * height / 8
      var x = 0
      while (x < 8) {
        val a = gray(sy * width + x * width / 9)
        val b = gray(sy * width + (x + 1) * width / 9)
        if (a > b) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Interleaved signed 16-bit PCM samples of a WAV payload — the audio
    * twin of [[decodeGray]]. Validates the container like [[decode]] and
    * fails loudly on anything that is not a canonical PCM WAV. */
  def decodePcm(payload: Array[Byte]): Array[Int] = {
    val m = decode(payload)
    if (m.width != 0 || m.height != 0)
      fail("audio decode on a raster payload (BMP/PPM)")
    val n = m.nFrames * m.channels
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // little-endian signed short
      out(i) = ((payload(44 + 2 * i) & 0xFF) |
        (payload(44 + 2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** Number of energy windows behind [[audioFp64]]'s 64 bits. */
  val AudioFpWindows = 65

  /** Audio fingerprint (64-bit): split the interleaved sample stream into
    * [[AudioFpWindows]] equal time windows — sample i belongs to window
    * i·65/n (integer floor; for n ≥ 65 every window is non-empty) — take
    * each window's ENERGY Σ v² (exact integer: |v| ≤ 2^15, windows ≤ 2^20
    * samples keep the sum far inside Long), and set bit w iff
    * E_w > E_{w+1} — the dHash comparison rule transplanted from the
    * pixel grid to the time-energy envelope. Integer DSP end to end (no
    * FFT, no floats), so the fingerprint is exactly mirrorable in SQL;
    * near-identical audio (small amplitude perturbations) moves few
    * bits, and Hamming distance is the dissimilarity — same contract as
    * [[dhash64]]. */
  def audioFp64(samples: Array[Int]): Long = {
    val n = samples.length
    val e = new Array[Long](AudioFpWindows)
    var i = 0
    while (i < n) {
      val w = ((i.toLong * AudioFpWindows) / n).toInt
      val v = samples(i).toLong
      e(w) += v * v
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (e(w) > e(w + 1)) hash |= 1L << w
      w += 1
    }
    hash
  }

  /** Y4M (YUV4MPEG2) — the public uncompressed video container: one ASCII
    * stream header (`YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C444\n`), then per
    * frame an ASCII `FRAME\n` marker followed by raw planes. The subset
    * here is C444 (full-resolution Y, U, V planes — 3wh bytes/frame) and
    * Cmono (Y only — wh bytes/frame); anything else, INCLUDING a missing
    * C tag (the Y4M default is C420, whose chroma subsampling this codec
    * does not implement), fails loudly like the other containers.
    * Fixture bytes are closed forms of (seed, frame, plane offset) so the
    * oracle mirrors every sampled luma value without parsing:
    * Y(f, p) = (seed + 997·f + 31·p) mod 256; U/V are (seed + f + p) and
    * (seed + 2f + p) mod 256 — decoded and skipped by the gray path
    * (luma IS the Y plane; no RGB conversion exists to get wrong, which
    * is why the hash gate pins plane OFFSETS instead). */
  def encodeY4m(width: Int, height: Int, nFrames: Int, seed: Long,
      mono: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 1024 && height <= 1024 &&
      nFrames > 0 && nFrames <= 1000)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C${if (mono) "mono" else "444"}\n"
      .getBytes(StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val planeBytes = width * height
    val frameBytes = (if (mono) 1 else 3) * planeBytes
    val out = new Array[Byte](
      header.length + nFrames * (marker.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(marker, 0, out, off, marker.length)
      off += marker.length
      var p = 0
      while (p < planeBytes) { // Y plane
        out(off + p) = ((seed + 997L * f + 31L * p) & 0xFF).toByte
        p += 1
      }
      if (!mono) {
        var q = 0
        while (q < planeBytes) { // U plane
          out(off + planeBytes + q) = ((seed + f + q) & 0xFF).toByte
          q += 1
        }
        var r = 0
        while (r < planeBytes) { // V plane
          out(off + 2 * planeBytes + r) = ((seed + 2L * f + r) & 0xFF).toByte
          r += 1
        }
      }
      off += frameBytes
      f += 1
    }
    out
  }

  /** Closed-form [[encodeY4m]] payload size — the oracle's mirror:
    * header chars + per-frame (6 + planes·wh). */
  def y4mSize(width: Int, height: Int, nFrames: Int, mono: Boolean = false): Long = {
    val header = "YUV4MPEG2 W".length + width.toString.length +
      " H".length + height.toString.length +
      " F25:1 Ip A1:1 C".length + (if (mono) 4 else 3) + 1
    header.toLong +
      nFrames.toLong * (6L + (if (mono) 1L else 3L) * width * height)
  }

  /** Parsed Y4M: (width, height, nFrames, planesPerFrame, frame0Offset,
    * headerLen). Validates the stream header, every FRAME marker, and
    * that the payload length is exactly header + n·(6 + planes·wh). */
  private def parseY4m(p: Array[Byte]): (Int, Int, Int, Int, Int) = {
    var i = 0
    while (i < p.length && p(i) != '\n') i += 1
    if (i >= p.length) fail("Y4M stream header unterminated")
    val header = new String(p, 0, i, StandardCharsets.US_ASCII)
    val tags = header.split(' ')
    if (tags.head != "YUV4MPEG2") fail("not a YUV4MPEG2 stream header")
    var w = -1; var h = -1; var cs: String = null
    tags.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'C' => cs = t.drop(1)
        case _ => () // F/I/A/X tags carry no layout the subset needs
      }
    }
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535)
      fail(s"Y4M dimensions out of range: ${w}x$h")
    val planes = cs match {
      case "444" => 3
      case "mono" => 1
      case null => fail("Y4M colorspace tag missing (default C420 unsupported " +
        "— this codec's subset is C444/Cmono)")
      case other => fail(s"unsupported Y4M colorspace C$other (C444/Cmono only)")
    }
    val headerLen = i + 1
    val frameBytes = planes * w * h
    val per = 6L + frameBytes
    val body = p.length.toLong - headerLen
    if (body <= 0 || body % per != 0)
      fail(s"Y4M payload $body body bytes not a whole number of " +
        s"$per-byte frames")
    val n = (body / per).toInt
    var f = 0
    while (f < n) {
      val off = headerLen + f * per.toInt
      if (!(p(off) == 'F' && p(off + 1) == 'R' && p(off + 2) == 'A' &&
            p(off + 3) == 'M' && p(off + 4) == 'E' && p(off + 5) == '\n'))
        fail(s"Y4M frame $f marker malformed at offset $off")
      f += 1
    }
    (w, h, n, planes, headerLen)
  }

  private def decodeY4m(p: Array[Byte]): MediaMeta = {
    val (w, h, n, planes, _) = parseY4m(p)
    MediaMeta(w, h, channels = planes, nFrames = n, sizeBytes = p.length.toLong)
  }

  /** Frame `idx`'s grayscale raster of a Y4M payload: the Y plane read
    * in place (luma needs no conversion) — the video twin of
    * [[decodeGray]]. Fails loudly on a non-Y4M payload or an
    * out-of-range frame index. */
  def y4mFrameGray(payload: Array[Byte], idx: Int): (Int, Int, Array[Int]) = {
    if (payload == null || payload.length < 9 || payload(0) != 'Y')
      fail("video decode requires a YUV4MPEG2 container")
    val (w, h, n, planes, headerLen) = parseY4m(payload)
    if (idx < 0 || idx >= n) fail(s"Y4M frame index $idx outside 0..${n - 1}")
    val off = headerLen + idx * (6 + planes * w * h) + 6
    val gray = new Array[Int](w * h)
    var p = 0
    while (p < w * h) { gray(p) = payload(off + p) & 0xFF; p += 1 }
    (w, h, gray)
  }

  /** Frames a clip fingerprint samples. */
  val VideoFpMaxFrames = 4

  /** Clip fingerprint: [[dhash64]] of each SAMPLED frame's Y plane at the
    * frame-plan indices ([[Multimodal.sampleFrameIndices]] — i·n/max
    * integer floors, ≤ [[VideoFpMaxFrames]] slots). Per-frame hashes are
    * kept ALIGNED (slot order) rather than folded into one word: clip
    * near-duplication is judged per aligned frame pair, so a clip that
    * shares an opening frame but diverges later is NOT a near-dup —
    * folding would lose exactly that. */
  def videoFp(payload: Array[Byte]): Array[Long] = {
    val (_, _, n, _, _) = parseY4m(payload)
    Multimodal.sampleFrameIndices(n, VideoFpMaxFrames).map { idx =>
      val (w, h, gray) = y4mFrameGray(payload, idx)
      dhash64(w, h, gray)
    }.toArray
  }

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
      ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  /** Sniff + parse. Throws on anything that is not a well-formed BMP /
    * P6 PPM / PCM WAV / Y4M. */
  def decode(payload: Array[Byte]): MediaMeta = {
    if (payload == null || payload.length < 2) fail("payload shorter than any magic")
    if (payload(0) == 'B' && payload(1) == 'M') decodeBmp(payload)
    else if (payload(0) == 'P' && payload(1) == '6') decodePpm(payload)
    else if (payload.length >= 9 && payload(0) == 'Y' && payload(1) == 'U' &&
      payload(2) == 'V' && payload(3) == '4') decodeY4m(payload)
    else if (payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
      decodeWav(payload)
    else fail(s"unrecognized container magic 0x${(payload(0) & 0xFF).toHexString}" +
      s"${(payload(1) & 0xFF).toHexString}")
  }

  private def decodeBmp(p: Array[Byte]): MediaMeta = {
    if (p.length < 54) fail(s"BMP header truncated at ${p.length} bytes")
    val w = le32(p, 18)
    val h = le32(p, 22)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535) fail(s"BMP dimensions out of range: ${w}x$h")
    if (bpp != 24) fail(s"unsupported BMP bit depth $bpp (24-bit only)")
    if (compression != 0) fail(s"unsupported BMP compression $compression")
    val rowBytes = (3L * w + 3) / 4 * 4
    val expected = le32(p, 10) + rowBytes * h
    if (p.length < expected) fail(
      s"BMP payload ${p.length} bytes shorter than header-implied $expected")
    MediaMeta(w, h, channels = 3, nFrames = 1, sizeBytes = p.length.toLong)
  }

  private def decodePpm(p: Array[Byte]): MediaMeta = {
    // header tokens separated by single whitespace: P6, width, height,
    // maxval, one whitespace, then raster
    var i = 2
    def token(): Long = {
      while (i < p.length && Character.isWhitespace(p(i))) i += 1
      var v = -1L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (p(i) - '0'); i += 1
      }
      if (v < 0) fail("PPM header ended before a numeric token")
      v
    }
    val w = token(); val h = token(); val maxval = token()
    if (i >= p.length || !Character.isWhitespace(p(i))) fail("PPM raster separator missing")
    i += 1
    if (w <= 0 || h <= 0 || w > 65535 || h > 65535) fail(s"PPM dimensions out of range: ${w}x$h")
    if (maxval != 255) fail(s"unsupported PPM maxval $maxval")
    if (p.length - i < 3 * w * h) fail(
      s"PPM raster ${p.length - i} bytes, header implies ${3 * w * h}")
    MediaMeta(w.toInt, h.toInt, channels = 3, nFrames = 1, sizeBytes = p.length.toLong)
  }

  private def decodeWav(p: Array[Byte]): MediaMeta = {
    if (p.length < 44) fail(s"WAV header truncated at ${p.length} bytes")
    if (!(p(12) == 'f' && p(13) == 'm' && p(14) == 't' && p(15) == ' '))
      fail("WAV fmt chunk not at canonical offset")
    val audioFormat = le16(p, 20)
    if (audioFormat != 1) fail(s"unsupported WAV format $audioFormat (PCM only)")
    val channels = le16(p, 22)
    val blockAlign = le16(p, 32)
    if (channels <= 0 || channels > 8) fail(s"WAV channel count $channels out of range")
    if (blockAlign != channels * 2) fail(
      s"WAV block align $blockAlign inconsistent with $channels 16-bit channels")
    if (!(p(36) == 'd' && p(37) == 'a' && p(38) == 't' && p(39) == 'a'))
      fail("WAV data chunk not at canonical offset")
    val dataBytes = le32(p, 40)
    if (dataBytes < 0 || 44L + dataBytes > p.length) fail(
      s"WAV data chunk $dataBytes bytes exceeds payload ${p.length}")
    MediaMeta(0, 0, channels, nFrames = dataBytes / blockAlign,
      sizeBytes = p.length.toLong)
  }
}
