package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.multimodal.Multimodal

/** Multimodal pipeline queries over REAL decoded containers: every
  * document row carries a valid BMP / binary-PPM / PCM-WAV payload
  * (synthesized deterministically from its id — the planted binary
  * fixture at every SF), the serving path parses the actual bytes with
  * the pure-JVM [[graft.multimodal.MediaCodec]], and the DuckDB oracle
  * computes the SAME metadata from the id's closed forms WITHOUT parsing
  * — hash equality therefore proves the decoder reads headers, raster
  * sizes, and chunk layouts correctly. A malformed payload fails the job
  * loudly (spec-gated), never emits garbage rows. */
object MultimodalQueries {

  /** Decode features for every document: payload → (width, height,
    * channels, n_frames, size_bytes) via the codegen'd
    * [[graft.functions.MediaExpressions.decode]] kernel. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withPayload =
      Multimodal.withMediaPayload(VectorModel.documents(spark, dir), "doc_id")
    withPayload
      .withColumn("meta", graft.functions.MediaExpressions.decode(col("payload")))
      .select(
        col("doc_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.channels").cast("long").as("channels"),
        col("meta.nFrames").cast("long").as("n_frames"),
        col("meta.sizeBytes").as("size_bytes"))
      .orderBy("doc_id")
  }

  /** The fixture's closed forms, as a reusable subquery (the oracle's
    * mirror of [[graft.functions.MediaKernel.fixture]] — id rotation
    * doc_id%3 over BMP/PPM/WAV, every 150th id a large BMP). */
  private val fixtureFormsSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |         CASE WHEN doc_id % 150 = 0 THEN 300 + doc_id % 301
      |              ELSE 4 + doc_id % 13 END
      |       WHEN doc_id % 3 = 1 THEN 4 + doc_id % 17
      |       ELSE 0 END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |         CASE WHEN doc_id % 150 = 0 THEN 200 + (doc_id * 3) % 201
      |              ELSE 4 + (doc_id * 3) % 11 END
      |       WHEN doc_id % 3 = 1 THEN 4 + (doc_id * 5) % 13
      |       ELSE 0 END AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2 ELSE 3 END AS channels,
      |  CASE WHEN doc_id % 3 = 2 THEN 100 + doc_id % 900 ELSE 1 END AS n_frames
      |FROM documents""".stripMargin

  val mediaFeaturesSql: String =
    s"""SELECT doc_id,
      |  CAST(width AS BIGINT) AS width,
      |  CAST(height AS BIGINT) AS height,
      |  CAST(channels AS BIGINT) AS channels,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN
      |         54 + ((3 * width + 3) // 4) * 4 * height
      |       WHEN doc_id % 3 = 1 THEN
      |         9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
      |           + 3 * width * height
      |       ELSE 44 + n_frames * channels * 2 END AS BIGINT) AS size_bytes
      |FROM ($fixtureFormsSql)
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling plan per document: which frame indices the sampler
    * would decode — mirrors [[Multimodal.sampleFrameIndices]]'s closed
    * form (i·n/max integer division) as scalars. Raster rows have one
    * frame; WAV rows sample their PCM frames. */
  def framePlan(spark: SparkSession, dir: String): DataFrame = {
    val maxF = 4
    val n = col("n_frames")
    mediaFeatures(spark, dir)
      .select(
        col("doc_id"), n,
        least(n, lit(maxF.toLong)).as("n_sampled"),
        lit(0L).as("first_idx"),
        when(n <= maxF, n - 1)
          .otherwise(expr(s"(${maxF - 1} * n_frames) div $maxF")).as("last_idx"))
      .orderBy("doc_id")
  }

  val framePlanSql: String =
    s"""SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(least(n_frames, 4) AS BIGINT) AS n_sampled,
      |  CAST(0 AS BIGINT) AS first_idx,
      |  CAST(CASE WHEN n_frames <= 4 THEN n_frames - 1
      |       ELSE (3 * n_frames) // 4 END AS BIGINT) AS last_idx
      |FROM ($fixtureFormsSql)
      |ORDER BY doc_id""".stripMargin

  /** Resize plan per document: bound the longest side to 256 preserving
    * aspect — mirror of [[Multimodal.resizePlan]]'s integer arithmetic.
    * The every-150th-id large BMPs are the rows that actually downscale;
    * small rasters and WAV (0×0) no-op. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val maxDim = 256
    val longest = greatest(col("width"), col("height"))
    mediaFeatures(spark, dir)
      .select(
        col("doc_id"), col("width"), col("height"),
        when(longest <= maxDim, col("width"))
          .otherwise(expr(s"(width * $maxDim) div greatest(width, height)")).as("out_w"),
        when(longest <= maxDim, col("height"))
          .otherwise(expr(s"(height * $maxDim) div greatest(width, height)")).as("out_h"))
      .orderBy("doc_id")
  }

  val resizePlanSql: String =
    s"""SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN width
      |       ELSE (width * 256) // greatest(width, height) END AS BIGINT) AS out_w,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN height
      |       ELSE (height * 256) // greatest(width, height) END AS BIGINT) AS out_h
      |FROM ($fixtureFormsSql)
      |ORDER BY doc_id""".stripMargin

  /** Perceptual difference-hash (dHash) of every RASTER document payload —
    * the image-dedup key, HASH-GATED end to end: the serving path parses
    * the real BMP/PPM bytes (decode → BGR/RGB → integer luma → 9×8 grid →
    * 64 difference bits, [[graft.multimodal.MediaCodec.dhash64]]), while
    * the oracle computes every sampled gray value from the fixture's id
    * closed forms WITHOUT parsing — equality proves the raster decode,
    * the row flip, the channel order, the luma, and the hash bit layout
    * all at once. The 64-bit hash ships as two unsigned 32-bit halves so
    * neither side plays sign games with bit 63. Near-dup PAIRING over
    * these hashes is [[graft.dedup.Dedup.imageNearDupPairs]]
    * (MultimodalSpec: planted perturbed pairs + brute-force parity). */
  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    val withPayload =
      Multimodal.withMediaPayload(VectorModel.documents(spark, dir), "doc_id")
    withPayload
      .where(pmod(col("doc_id"), lit(3)) =!= 2) // rasters only (WAV has none)
      .select(col("doc_id"),
        graft.functions.MediaExpressions.dhash(col("payload")).as("dh"))
      .select(col("doc_id"),
        shiftrightunsigned(col("dh"), 32).as("dhash_hi"),
        col("dh").bitwiseAND(lit(0xFFFFFFFFL)).as("dhash_lo"))
      .orderBy("doc_id")
  }

  /** Closed-form mirror of [[imagePhash]]: the fixture rasters are pure
    * functions of (doc_id, w, h) — BMP pixel v = id + y_file·w + x stored
    * bottom-up in BGR byte order, PPM byte i = (id + 31·i) mod 256 stored
    * top-down RGB — so each of the 72 grid samples, the luma, and every
    * difference bit is SQL arithmetic. */
  val imagePhashSql: String = {
    // gray at image-raster point (sx, sy) per container, mirroring
    // MediaCodec.decodeGray term for term (integer floors throughout)
    def bmpGray(sx: String, sy: String): String = {
      val v = s"(doc_id + (h - 1 - $sy) * w + $sx)"
      val b = s"($v % 256)"
      val g = s"(($v // 8) % 256)"
      val r = s"(($v // 64) % 256)"
      s"((299 * $r + 587 * $g + 114 * $b) // 1000)"
    }
    def ppmGray(sx: String, sy: String): String = {
      val p = s"($sy * w + $sx)"
      val r = s"((doc_id + (3 * $p) * 31) % 256)"
      val g = s"((doc_id + (3 * $p + 1) * 31) % 256)"
      val b = s"((doc_id + (3 * $p + 2) * 31) % 256)"
      s"((299 * $r + 587 * $g + 114 * $b) // 1000)"
    }
    val grayCols = (for { y <- 0 until 8; x <- 0 until 9 } yield {
      val sx = s"(($x * w) // 9)"
      val sy = s"(($y * h) // 8)"
      s"CASE WHEN doc_id % 3 = 0 THEN ${bmpGray(sx, sy)} ELSE ${ppmGray(sx, sy)} END AS g${x}_$y"
    }).mkString(",\n  ")
    def bit(k: Int): String = {
      val y = k / 8; val x = k % 8
      s"CASE WHEN g${x}_$y > g${x + 1}_$y THEN ${1L << (k % 32)} ELSE 0 END"
    }
    val lo = (0 until 32).map(bit).mkString(" + ")
    val hi = (32 until 64).map(bit).mkString(" + ")
    s"""WITH f AS ($fixtureFormsSql),
       |r AS (SELECT doc_id, width AS w, height AS h FROM f WHERE doc_id % 3 <> 2),
       |g AS (SELECT doc_id,
       |  $grayCols
       |FROM r)
       |SELECT doc_id,
       |  CAST($hi AS BIGINT) AS dhash_hi,
       |  CAST($lo AS BIGINT) AS dhash_lo
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Band-energy audio fingerprint of every PCM-WAV document payload —
    * the audio-dedup key, HASH-GATED end to end like [[imagePhash]]: the
    * serving path parses the real RIFF/WAVE bytes (header validation →
    * signed 16-bit PCM → 65-window integer energy envelope → 64
    * difference bits, [[graft.multimodal.MediaCodec.audioFp64]]), while
    * the oracle computes every sample from the fixture's id closed form
    * WITHOUT parsing — equality proves the chunk layout, the
    * little-endian signed decode, the window assignment, and the bit
    * layout all at once. Ships as unsigned 32-bit halves like the image
    * hash. Near-dup PAIRING over these fingerprints is
    * [[graft.dedup.Dedup.audioNearDupPairs]] (MultimodalSpec: planted
    * perturbed pairs + brute-force parity). */
  def audioFp(spark: SparkSession, dir: String): DataFrame = {
    val withPayload =
      Multimodal.withMediaPayload(VectorModel.documents(spark, dir), "doc_id")
    withPayload
      .where(pmod(col("doc_id"), lit(3)) === 2) // WAV rows only
      .select(col("doc_id"),
        graft.functions.MediaExpressions.audioFp(col("payload")).as("fp"))
      .select(col("doc_id"),
        shiftrightunsigned(col("fp"), 32).as("afp_hi"),
        col("fp").bitwiseAND(lit(0xFFFFFFFFL)).as("afp_lo"))
      .orderBy("doc_id")
  }

  /** Closed-form mirror of [[audioFp]]: the fixture WAV's interleaved
    * sample i is (id + 17·i) mod 2^16 ([[graft.multimodal.MediaCodec.
    * encodeWav]] with seed = id), reinterpreted signed; window = i·65/n,
    * energies exact BIGINT sums, difference bits via a lead() over the
    * 65 per-doc energy rows. */
  val audioFpSql: String =
    s"""WITH f AS (SELECT doc_id,
       |    (100 + doc_id % 900) * (1 + doc_id % 2) AS n
       |  FROM documents WHERE doc_id % 3 = 2),
       |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM f),
       |v AS (SELECT doc_id, CAST((i * 65) // n AS INTEGER) AS w,
       |    (CASE WHEN (doc_id + 17 * i) % 65536 >= 32768
       |          THEN (doc_id + 17 * i) % 65536 - 65536
       |          ELSE (doc_id + 17 * i) % 65536 END) AS x
       |  FROM s),
       |e AS (SELECT doc_id, w, CAST(sum(x * x) AS BIGINT) AS e
       |  FROM v GROUP BY doc_id, w),
       |b AS (SELECT doc_id, w, e,
       |    lead(e) OVER (PARTITION BY doc_id ORDER BY w) AS en
       |  FROM e)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN w >= 32 AND w < 64 AND e > en
       |    THEN (CAST(1 AS BIGINT) << (w - 32)) ELSE 0 END) AS BIGINT) AS afp_hi,
       |  CAST(sum(CASE WHEN w < 32 AND e > en
       |    THEN (CAST(1 AS BIGINT) << w) ELSE 0 END) AS BIGINT) AS afp_lo
       |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-sampled-frame dHash of every document's Y4M VIDEO payload — the
    * video-dedup key, HASH-GATED end to end like [[imagePhash]]/
    * [[audioFp]]: the serving path parses the real YUV4MPEG2 bytes
    * (stream-header validation → FRAME markers → frame-plan sampling at
    * i·n/4 → Y-plane luma → 9×8 difference grid,
    * [[graft.multimodal.MediaCodec.videoFp]]), while the oracle computes
    * every sampled luma value from the fixture's id closed form WITHOUT
    * parsing — equality proves the header parse, the per-frame plane
    * offsets (Y first, U/V skipped; Cmono rows have no chroma at all yet
    * identical Y bytes), the sampling arithmetic, and the hash bit
    * layout all at once. One row per (doc, slot), slots aligned — the
    * key [[graft.dedup.Dedup.videoNearDupPairs]] verifies per aligned
    * slot (MultimodalSpec: planted perturbed twins + brute-force
    * parity). Ships as unsigned 32-bit halves like the other hashes. */
  def videoPhash(spark: SparkSession, dir: String): DataFrame = {
    val withPayload =
      Multimodal.withVideoPayload(VectorModel.documents(spark, dir), "doc_id")
    withPayload
      .select(col("doc_id"),
        posexplode(graft.functions.MediaExpressions.videoFp(col("payload")))
          .as(Seq("slot", "fp")))
      .select(col("doc_id"), col("slot").cast("long").as("slot"),
        shiftrightunsigned(col("fp"), 32).as("dhash_hi"),
        col("fp").bitwiseAND(lit(0xFFFFFFFFL)).as("dhash_lo"))
      .orderBy("doc_id", "slot")
  }

  /** Closed-form mirror of [[videoPhash]]: the fixture clip's luma is a
    * pure function of (doc_id, frame, plane offset) —
    * Y(f, p) = (id + 997f + 31p) mod 256 ([[graft.multimodal.MediaCodec.
    * encodeY4m]] with seed = id) — and the sampled frame index is the
    * frame plan's i·n/4 floor, so each of the 72 grid lumas per slot and
    * every difference bit is SQL arithmetic. */
  val videoPhashSql: String = {
    def gray(sx: String, sy: String): String =
      s"((doc_id + 997 * f + 31 * ($sy * w + $sx)) % 256)"
    val grayCols = (for { y <- 0 until 8; x <- 0 until 9 } yield {
      val sx = s"(($x * w) // 9)"
      val sy = s"(($y * h) // 8)"
      s"${gray(sx, sy)} AS g${x}_$y"
    }).mkString(",\n  ")
    def bit(k: Int): String = {
      val y = k / 8; val x = k % 8
      s"CASE WHEN g${x}_$y > g${x + 1}_$y THEN ${1L << (k % 32)} ELSE 0 END"
    }
    val lo = (0 until 32).map(bit).mkString(" + ")
    val hi = (32 until 64).map(bit).mkString(" + ")
    s"""WITH vd AS (SELECT doc_id,
       |    4 + doc_id % 9 AS w, 4 + (doc_id * 3) % 7 AS h, 2 + doc_id % 7 AS n
       |  FROM documents),
       |sl AS (SELECT doc_id, w, h, n, unnest(range(0, least(n, 4))) AS slot FROM vd),
       |fr AS (SELECT doc_id, w, h, slot,
       |    CASE WHEN n <= 4 THEN slot ELSE (slot * n) // 4 END AS f FROM sl),
       |g AS (SELECT doc_id, slot,
       |  $grayCols
       |FROM fr)
       |SELECT doc_id, CAST(slot AS BIGINT) AS slot,
       |  CAST($hi AS BIGINT) AS dhash_hi,
       |  CAST($lo AS BIGINT) AS dhash_lo
       |FROM g ORDER BY doc_id, slot""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> (mediaFeatures _),
    "dd_video_phash" -> (videoPhash _),
    "mm_frame_plan" -> (framePlan _),
    "mm_resize_plan" -> (resizePlan _),
    "dd_image_phash" -> (imagePhash _),
    "dd_audio_fp" -> (audioFp _))

  val oracleSql: Map[String, String] = Map(
    "mm_media_features" -> mediaFeaturesSql,
    "dd_video_phash" -> videoPhashSql,
    "mm_frame_plan" -> framePlanSql,
    "mm_resize_plan" -> resizePlanSql,
    "dd_image_phash" -> imagePhashSql,
    "dd_audio_fp" -> audioFpSql)
}
