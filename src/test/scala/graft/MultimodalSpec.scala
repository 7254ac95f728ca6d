package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.multimodal.{MediaCodec, Multimodal}
import graft.queries.MultimodalQueries

/** Multimodal plumbing: the mapPartitions decoder must agree with the
  * expression-level mirror, and frame sampling must be deterministic. */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode agrees with the expression kernel (real containers)") {
    val docs = VectorModel.documents(spark, Sf0001)
    val viaExpr = MultimodalQueries.mediaFeatures(spark, Sf0001)
      .select("doc_id", "width", "height", "n_frames", "size_bytes")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val viaMap = Multimodal.decodeMeta(
      Multimodal.withMediaPayload(docs, "doc_id").select("doc_id", "payload"), "doc_id")
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.nFrames"), col("meta.sizeBytes"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong, r.getLong(4))))
      .toMap
    assert(viaMap === viaExpr)
    assert(viaMap.nonEmpty)
  }

  test("codec round-trip: encode then decode recovers the parameters for every container") {
    import graft.multimodal.MediaCodec
    for (w <- Seq(1, 4, 13, 300); h <- Seq(1, 7, 200)) {
      val bmp = MediaCodec.decode(MediaCodec.encodeBmp(w, h, seed = w * 31 + h))
      assert((bmp.width, bmp.height, bmp.channels, bmp.nFrames) === ((w, h, 3, 1)))
      assert(bmp.sizeBytes === MediaCodec.bmpSize(w, h))
      val ppm = MediaCodec.decode(MediaCodec.encodePpm(w, h, seed = h * 17 + w))
      assert((ppm.width, ppm.height, ppm.channels, ppm.nFrames) === ((w, h, 3, 1)))
      assert(ppm.sizeBytes === MediaCodec.ppmSize(w, h))
    }
    for (ch <- Seq(1, 2); n <- Seq(1, 100, 999)) {
      val wav = MediaCodec.decode(MediaCodec.encodeWav(ch, n, 8000, seed = n))
      assert((wav.width, wav.height, wav.channels, wav.nFrames) === ((0, 0, ch, n)))
      assert(wav.sizeBytes === MediaCodec.wavSize(ch, n))
    }
  }

  test("decode fails loudly on malformed payloads") {
    import graft.multimodal.MediaCodec
    def reject(p: Array[Byte], hint: String): Unit = {
      val e = intercept[IllegalArgumentException](MediaCodec.decode(p))
      assert(e.getMessage.contains("media decode failed"), s"$hint: ${e.getMessage}")
    }
    reject("not a container".getBytes, "text bytes")
    reject(Array[Byte]('B', 'M'), "truncated BMP header")
    reject(MediaCodec.encodeBmp(8, 8, 1).take(60).toArray, "BMP shorter than raster")
    reject(MediaCodec.encodePpm(8, 8, 1).take(20).toArray, "PPM shorter than raster")
    reject(MediaCodec.encodeWav(2, 10, 8000, 1).take(40).toArray, "truncated WAV")
    // and through the distributed path: a corrupt payload fails the job,
    // never emits a garbage row
    import spark.implicits._
    val bad = Seq((1L, "garbage".getBytes)).toDF("doc_id", "payload")
    val ex = intercept[Exception] {
      bad.withColumn("meta", graft.functions.MediaExpressions.decode(col("payload")))
        .select("meta.width").collect()
    }
    assert(ex.getMessage != null)
  }

  test("payload is real binary and metadata-only plans do not decode") {
    val withPayload = Multimodal.withPayload(VectorModel.documents(spark, Sf0001), "text")
    val first = withPayload.select("payload").limit(1).collect()(0)
    assert(first.get(0).isInstanceOf[Array[Byte]])
  }

  test("resize plan preserves aspect, bounds the longest side, no-ops when small") {
    assert(Multimodal.resizePlan(100, 50, 256) === ((100, 50)))
    assert(Multimodal.resizePlan(512, 256, 256) === ((256, 128)))
    assert(Multimodal.resizePlan(300, 400, 256) === ((192, 256)))
    val (w, h) = Multimodal.resizePlan(641, 480, 256)
    assert(math.max(w, h) === 256 && w * 480 <= 641 * h + 641) // aspect within floor error
  }

  test("frame sampling is deterministic and bounded") {
    assert(Multimodal.sampleFrameIndices(3, 4) === Seq(0, 1, 2))
    assert(Multimodal.sampleFrameIndices(30, 4) === Seq(0, 7, 15, 22))
    assert(Multimodal.sampleFrameIndices(30, 4) === Multimodal.sampleFrameIndices(30, 4))
  }

  test("dHash: identical rasters hash equal, small perturbations move few bits, formats differ") {
    def dh(p: Array[Byte]): Long = {
      val (w, h, g) = MediaCodec.decodeGray(p); MediaCodec.dhash64(w, h, g)
    }
    val a = MediaCodec.encodeBmp(64, 48, 7L)
    assert(dh(a) === dh(MediaCodec.encodeBmp(64, 48, 7L)))
    // perturb a handful of raster bytes: a NEAR duplicate, not an exact one
    val b = a.clone()
    var i = 0
    while (i < 12) { b(54 + 97 * i) = (b(54 + 97 * i) ^ 0x7f).toByte; i += 1 }
    val dist = java.lang.Long.bitCount(dh(a) ^ dh(b))
    assert(dist > 0 || java.util.Arrays.equals(
      a.slice(54, a.length), b.slice(54, b.length)) === false)
    assert(dist <= 16, s"12 flipped bytes moved $dist/64 bits — not perceptual")
    // same seed, different container → different bytes, unrelated hashes allowed;
    // decode must handle both and WAV must fail loudly
    dh(MediaCodec.encodePpm(64, 48, 7L))
    intercept[IllegalArgumentException](dh(MediaCodec.encodeWav(1, 100, 8000, 7L)))
  }

  test("audioFp64: identical clips hash equal, small perturbations move few bits, rasters fail") {
    def fp(p: Array[Byte]): Long = MediaCodec.audioFp64(MediaCodec.decodePcm(p))
    val a = MediaCodec.encodeWav(2, 700, 8000, 7L)
    assert(fp(a) === fp(MediaCodec.encodeWav(2, 700, 8000, 7L)))
    // nudge a handful of samples by ±1 in the low byte: a NEAR duplicate
    // (re-encode, say, or dithering) — the energy envelope barely moves
    val b = a.clone()
    var i = 0
    while (i < 20) { b(44 + 2 * (i * 61)) = (b(44 + 2 * (i * 61)) ^ 0x01).toByte; i += 1 }
    val dist = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(dist <= 8, s"20 nudged samples moved $dist/64 bits — not perceptual")
    // a different clip is far away
    val other = MediaCodec.encodeWav(2, 700, 8000, 999999L)
    assert(java.lang.Long.bitCount(fp(a) ^ fp(other)) > 8,
      "unrelated clips must not collide at near-dup distance")
    // audio decode on a raster payload fails loudly, like WAV under dHash
    intercept[IllegalArgumentException](fp(MediaCodec.encodeBmp(8, 8, 7L)))
  }

  test("audioNearDupPairs: planted perturbed pairs found; banded == brute force") {
    import spark.implicits._
    // plant: 20 base clips; each gets a near-dup twin (a few samples
    // nudged by one quantization step) — the SHARED fixture the streaming
    // parity test replays (MediaFixtures: one definition, not copies)
    val rows = MediaFixtures.plantedClips
    val df = rows.toDF("doc_id", "payload")
    val banded = graft.dedup.Dedup
      .audioNearDupPairs(df, "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps: Seq[(Long, Long)] = rows.map { case (id, p) =>
      (id, MediaCodec.audioFp64(MediaCodec.decodePcm(p)))
    }
    val brute = (for {
      (ia, ha) <- fps
      (ib, hb) <- fps
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(banded === brute, "pigeonhole banding must be exactly the brute-force pair set")
    assert(banded.exists { case (a, b, _) => b == a + 1 && a % 2 == 0 },
      "no planted twin pair found — perturbation too destructive for the energy envelope")
    val salted = graft.dedup.Dedup
      .audioNearDupPairs(df, "doc_id", "payload", 3, skewSalt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === banded)
  }

  test("imageNearDupPairs: planted perturbed pairs found; banded == brute force") {
    import spark.implicits._
    // plant: 20 base images; each gets a near-dup twin (3 raster bytes
    // flipped) — the SHARED fixture the streaming parity test replays
    val rows = MediaFixtures.plantedRasters
    val df = rows.toDF("doc_id", "payload")
    val banded = graft.dedup.Dedup
      .imageNearDupPairs(df, "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same hashes
    val hashes: Seq[(Long, Long)] = rows.map { case (id, p) =>
      val (w, h, g) = MediaCodec.decodeGray(p)
      (id, MediaCodec.dhash64(w, h, g))
    }
    val brute = (for {
      (ia, ha) <- hashes
      (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(banded === brute, "pigeonhole banding must be exactly the brute-force pair set")
    // at least some planted twins survive as near-dups at this budget
    assert(banded.exists { case (a, b, _) => b == a + 1 && a % 2 == 0 },
      "no planted twin pair found — perturbation too destructive for dHash")
    // salted variant is pair-identical
    val salted = graft.dedup.Dedup
      .imageNearDupPairs(df, "doc_id", "payload", 3, skewSalt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === banded)
  }

  test("Y4M codec: encode/decode round-trip, closed-form size, fail-loud subset") {
    val p = MediaCodec.encodeY4m(12, 8, 5, 42L)
    val m = MediaCodec.decode(p)
    assert((m.width, m.height, m.channels, m.nFrames) === ((12, 8, 3, 5)))
    assert(m.sizeBytes === p.length.toLong)
    assert(MediaCodec.y4mSize(12, 8, 5) === p.length.toLong)
    val mono = MediaCodec.encodeY4m(12, 8, 5, 42L, mono = true)
    val mm = MediaCodec.decode(mono)
    assert((mm.width, mm.height, mm.channels, mm.nFrames) === ((12, 8, 1, 5)))
    assert(MediaCodec.y4mSize(12, 8, 5, mono = true) === mono.length.toLong)
    // the Y plane is identical across colorspaces (chroma is extra planes)
    assert(MediaCodec.y4mFrameGray(p, 2)._3.toSeq ===
      MediaCodec.y4mFrameGray(mono, 2)._3.toSeq)
    // fail-loud: the Y4M DEFAULT colorspace (no C tag = C420) is outside
    // the subset and must say so; malformed markers and truncations throw
    def hdr(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val noC = hdr("YUV4MPEG2 W4 H4 F25:1 Ip A1:1\n") ++
      hdr("FRAME\n") ++ Array.fill[Byte](48)(1)
    val eC = intercept[IllegalArgumentException](MediaCodec.decode(noC))
    assert(eC.getMessage.contains("C420"))
    val badMarker = MediaCodec.encodeY4m(4, 4, 2, 1L)
    badMarker(MediaFixtures.y4mFrame0(badMarker) - 6) = 'X'.toByte
    assert(intercept[IllegalArgumentException](MediaCodec.decode(badMarker))
      .getMessage.contains("marker"))
    val truncated = MediaCodec.encodeY4m(4, 4, 2, 1L).dropRight(5)
    assert(intercept[IllegalArgumentException](MediaCodec.decode(truncated))
      .getMessage.contains("frames"))
    intercept[IllegalArgumentException](MediaCodec.y4mFrameGray(p, 5))
    intercept[IllegalArgumentException](
      MediaCodec.videoFp(MediaCodec.encodeBmp(8, 8, 1L)))
  }

  test("videoFp: aligned slots, frame-plan sampling, perturbations move few slot-0 bits") {
    val a = MediaCodec.encodeY4m(16, 12, 7, 9L)
    val fa = MediaCodec.videoFp(a)
    assert(fa.length === 4) // 7 frames sample at the 4-slot budget
    assert(fa.toSeq === MediaCodec.videoFp(MediaCodec.encodeY4m(16, 12, 7, 9L)).toSeq)
    // slots are the PLAN's frames: i·7/4 = frames 0,1,3,5
    val planned = graft.multimodal.Multimodal.sampleFrameIndices(7, 4).map { i =>
      val (w, h, g) = MediaCodec.y4mFrameGray(a, i)
      MediaCodec.dhash64(w, h, g)
    }
    assert(fa.toSeq === planned)
    val short = MediaCodec.videoFp(MediaCodec.encodeY4m(16, 12, 3, 9L))
    assert(short.length === 3) // under budget: every frame sampled
    // frame-0-only perturbation: slot 0 moves a few bits, others exactly 0
    val b = a.clone()
    val y0 = MediaFixtures.y4mFrame0(a)
    Seq(0, 1).foreach(j => b(y0 + 17 * j) = (b(y0 + 17 * j) ^ 0x11).toByte)
    val fb = MediaCodec.videoFp(b)
    val d0 = java.lang.Long.bitCount(fa(0) ^ fb(0))
    assert(d0 <= 3, s"2 nudged lumas moved $d0/64 slot-0 bits — not perceptual")
    (1 until 4).foreach(s => assert(fa(s) === fb(s), s"untouched slot $s moved"))
  }

  test("videoNearDupPairs: planted twins found; banded == brute force; opening-frame-only match rejected") {
    import spark.implicits._
    val rows = MediaFixtures.plantedVideos
    val df = rows.toDF("doc_id", "payload")
    val banded = graft.dedup.Dedup
      .videoNearDupPairs(df, "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps: Seq[(Long, Array[Long])] = rows.map { case (id, p) =>
      (id, MediaCodec.videoFp(p))
    }
    val brute = (for {
      (ia, ha) <- fps
      (ib, hb) <- fps
      if ia < ib && ha.length == hb.length
      mh = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.max
      if mh <= 3
    } yield (ia, ib, mh.toLong)).toSet
    assert(banded === brute, "slot-0 banding + aligned verify must equal brute force")
    assert(banded.exists { case (a, b, _) => b == a + 1 && a % 2 == 0 },
      "no planted twin pair found — perturbation too destructive")
    val salted = graft.dedup.Dedup
      .videoNearDupPairs(df, "doc_id", "payload", 3, skewSalt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === banded)
    // a clip sharing ONLY the opening frame must not pair: same dims and
    // frame count as base 0, frame 0's Y bytes copied verbatim, later
    // frames from a far seed
    val base0 = rows.head._2
    val far = MediaCodec.encodeY4m(16, 12, 2, 777777L)
    val hybrid = far.clone()
    // frame-0 offsets differ between the two payloads (Cmono vs C444
    // headers differ by one char) — compute each side's own
    System.arraycopy(base0, MediaFixtures.y4mFrame0(base0),
      hybrid, MediaFixtures.y4mFrame0(hybrid), 16 * 12)
    val with3 = (rows :+ (1000L, hybrid)).toDF("doc_id", "payload")
    val got = graft.dedup.Dedup
      .videoNearDupPairs(with3, "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a == 1000L || b == 1000L },
      "a clip matching only the opening frame paired — the aligned verify leaked")
  }
}
