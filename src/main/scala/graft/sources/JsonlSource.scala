package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) readers/writers for the canonical
  * tables — the interchange format training-data pipelines actually
  * exchange corpora in. The reference has no I/O surface beyond pickling
  * its own state (vervectordb/__init__.py:556-594); this is the
  * ingest/egress story a pipeline needs around it.
  *
  * Design rules:
  *  - Every reader takes an EXPLICIT schema and casts to the canonical
  *    column types. Schema inference over JSONL is a full extra pass of
  *    the data at 100 TB and can silently drift types between drops
  *    (an all-int sample infers LONG where the corpus has doubles), so
  *    it is never used here.
  *  - JSONL is splittable line-by-line, so reads parallelize like any
  *    text source; writes go through the same clustered-write rules as
  *    parquet (no tasks × partitions file explosion).
  *  - Vectors travel as JSON arrays of numbers; binary payloads are NOT
  *    representable in JSONL — multimodal corpora keep payloads in
  *    parquet/object storage and JSONL carries the metadata + pointer,
  *    which is exactly what [[documentsSchema]]'s open shape allows.
  */
object JsonlSource {

  /** documents-table JSONL schema (doc_id, text, lang, source, n_chars). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** embeddings-table JSONL schema (vec_id, embedding, label) — label is
    * INT to match the canonical parquet table exactly. */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("label", IntegerType)))

  /** Read a documents corpus from JSONL with the canonical schema; rows
    * whose JSON does not parse land in `_corrupt` mode PERMISSIVE columns
    * as nulls — `dropMalformed = true` drops them instead (the usual
    * crawl-ingest choice: a bad line must not kill a 100 TB job). */
  def readDocuments(spark: SparkSession, path: String,
      dropMalformed: Boolean = true): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .json(path)

  /** Read an embeddings table from JSONL (vectors as JSON number arrays),
    * cast to the canonical float embedding column. */
  def readEmbeddings(spark: SparkSession, path: String,
      dropMalformed: Boolean = true): DataFrame =
    spark.read
      .schema(embeddingsSchema)
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .json(path)
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))

  /** Write any DataFrame as JSONL. `partitionCol` clusters rows first so
    * each output partition value gets one file, not one per task (the
    * same dynamic-partition-write rule as [[graft.index.Ivf.saveClustered]]). */
  def write(df: DataFrame, path: String, partitionCol: Option[String] = None): Unit =
    partitionCol match {
      case Some(c) =>
        df.repartition(col(c)).write.mode(SaveMode.Overwrite).partitionBy(c).json(path)
      case None =>
        df.write.mode(SaveMode.Overwrite).json(path)
    }

  /** Write gzip-compressed JSONL (`.json.gz`) — the format public text
    * corpora actually ship in. THE TRADE, stated plainly: gzip is a
    * non-splittable stream, so each file becomes exactly ONE read task —
    * a single 100 GB `.gz` serializes its whole decompress on one core.
    * The mitigation is the file count: egress keeps the input's
    * partitioning (many ~100 MB-class files), so reads parallelize
    * per-file just like the WARC layout; readers need no flag because
    * Hadoop's codec resolution keys off the extension. zstd has the same
    * seam (`compression=zstd`, splittable only with a seekable-format
    * wrapper); gzip is registered here as the interchange default. */
  def writeGz(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)

  /** Hadoop codec class for zstd backed by PURE-JVM streams
    * (aircompressor — already on Spark's classpath for its ORC/Parquet
    * codecs), because the Hadoop-native `ZStandardCodec` needs a
    * libhadoop built with zstd support, which most Spark deployments
    * (including this one) don't ship. Registered by CLASS NAME on both
    * sides of the seam: the writer passes it as the compression option,
    * the reader resolves it from the `.zst` extension once
    * [[ensureZstdCodec]] has added it to the codec list. */
  private[graft] val ZstdCodecClass = "io.airlift.compress.zstd.ZstdCodec"

  /** Idempotently append the zstd codec to the Hadoop codec list. This
    * is a MONOTONE registration (same class, same value, only ever
    * added), not a tuning knob — so unlike a per-call conf.set of a
    * planner threshold, concurrent callers can only race to write the
    * identical value. */
  private[graft] def ensureZstdCodec(spark: SparkSession): Unit = synchronized {
    val hc = spark.sparkContext.hadoopConfiguration
    val cur = hc.get("io.compression.codecs", "")
    if (!cur.contains(ZstdCodecClass))
      hc.set("io.compression.codecs",
        if (cur.isEmpty) ZstdCodecClass else s"$cur,$ZstdCodecClass")
  }

  /** Write zstd-compressed JSONL (`.json.zst`) — the compression public
    * corpora are moving to (better ratio AND faster decode than gzip).
    * The SAME trade as [[writeGz]], stated plainly: a zstd stream
    * without a seekable-frame wrapper is non-splittable, so each file is
    * exactly one read task and the mitigation is the file count (egress
    * keeps the input's partitioning — many moderate files, per-file
    * parallel reads). */
  def writeZst(df: DataFrame, path: String): Unit = {
    ensureZstdCodec(df.sparkSession)
    df.write.mode(SaveMode.Overwrite)
      .option("compression", ZstdCodecClass).json(path)
  }

  /** [[readDocuments]] over `.json.zst` files: registers the pure-JVM
    * codec (extension-keyed resolution needs it on the codec list), then
    * the standard schema'd read. */
  def readDocumentsZst(spark: SparkSession, path: String,
      dropMalformed: Boolean = true): DataFrame = {
    ensureZstdCodec(spark)
    readDocuments(spark, path, dropMalformed)
  }
}
