package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.sources.JsonlSource

/** JSONL ingest/egress: round-trips must preserve the canonical tables
  * value-for-value, malformed lines must not kill the read, and reads
  * must never rely on schema inference. */
class JsonlSpec extends SparkSpec {

  test("documents round-trip through JSONL value-identically") {
    val docs = VectorModel.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_docs").toString
    JsonlSource.write(docs, s"$dir/out")
    val back = JsonlSource.readDocuments(spark, s"$dir/out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(rows(back) === rows(docs))
  }

  test("embeddings round-trip through JSONL with float vectors intact") {
    val emb = VectorModel.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_emb").toString
    JsonlSource.write(emb, s"$dir/out")
    val back = JsonlSource.readEmbeddings(spark, s"$dir/out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq, r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(rows(back) === rows(emb))
  }

  test("gzip egress writes .gz part files that round-trip value-identically") {
    val docs = VectorModel.documents(spark, Sf0001).repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    JsonlSource.writeGz(docs, s"$dir/out")
    // the non-splittability mitigation made concrete: the egress kept the
    // input's partitioning as SEPARATE .gz files (per-file parallel read),
    // and codec resolution keys off the extension
    val parts = Option(new java.io.File(s"$dir/out").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")),
      s"expected .json.gz parts, got ${parts.map(_.getName).toSeq}")
    assert(parts.size === 4)
    val back = JsonlSource.readDocuments(spark, s"$dir/out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(rows(back) === rows(docs))
    // ...and the read fans out one task per gz file
    assert(back.rdd.getNumPartitions === 4)
  }

  test("zstd egress writes .zst part files that round-trip value-identically") {
    val docs = VectorModel.documents(spark, Sf0001).repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_zst").toString
    JsonlSource.writeZst(docs, s"$dir/out")
    // same non-splittability mitigation as gzip: one .zst file per input
    // partition, extension-keyed codec resolution (the pure-JVM codec —
    // no zstd-enabled libhadoop in this image)
    val parts = Option(new java.io.File(s"$dir/out").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.zst")),
      s"expected .json.zst parts, got ${parts.map(_.getName).toSeq}")
    assert(parts.size === 4)
    // the bytes really are zstd frames (magic 0xFD2FB528 little-endian)
    val head = java.nio.file.Files.readAllBytes(parts.head.toPath).take(4)
    assert(head === Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte),
      "part file does not start with the zstd frame magic")
    val back = JsonlSource.readDocumentsZst(spark, s"$dir/out")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(rows(back) === rows(docs))
    // one task per non-splittable file
    assert(back.rdd.getNumPartitions === 4)
  }

  test("malformed lines drop instead of failing the read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    val good = """{"doc_id": 1, "text": "a b c", "lang": "en", "source": "s0", "n_chars": 5}"""
    val bad = """{"doc_id": oops not json"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part.jsonl"),
      s"$good\n$bad\n$good\n".getBytes("UTF-8"))
    // mkdir-like path: read the file directly
    val read = JsonlSource.readDocuments(spark, s"$dir/part.jsonl")
    assert(read.count() === 2)
    assert(read.select("doc_id").distinct().head.getLong(0) === 1L)
    // partitioned egress: one file per partition value, not per task
    val out = s"$dir/by_lang"
    JsonlSource.write(read.withColumn("lang", lit("en")), out, partitionCol = Some("lang"))
    val files = Option(new java.io.File(s"$out/lang=en").listFiles()).toSeq.flatten
      .count(f => f.getName.startsWith("part-"))
    assert(files === 1, "clustered write must emit one file for the single lang value")
  }
}
