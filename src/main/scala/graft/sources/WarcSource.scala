package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 Web ARChive) reader/writer — the corpus-acquisition
  * front door. A real 100 TB training corpus does not start as a
  * `documents(text)` table; it starts as crawl archives of raw HTML
  * (Common Crawl publishes exactly this format). Every downstream stage
  * in this engine (dedup → decontaminate → gates → mix → pack) existed;
  * this seam is the ingest step that feeds them: WARC response records →
  * HTTP payload → HTML body → [[graft.text.HtmlText]] extraction →
  * canonical documents rows.
  *
  * Record grammar implemented (the public spec's core): a record is
  * `WARC/1.0\r\n` (or 1.1), header lines `Name: value\r\n` up to a blank
  * line, exactly `Content-Length` payload bytes, then the mandatory
  * `\r\n\r\n` record separator. Response records carry an HTTP message
  * (status line, headers, blank line, body) as payload.
  *
  * Fail-loud discipline (the [[AvroSource]] writer-schema-verification
  * spirit, applied to a framed byte format): a bad magic line, a missing
  * mandatory header, a non-numeric or overrunning Content-Length, a
  * truncated payload, or a missing record separator all throw with file
  * + offset — silently resynchronizing on the next `WARC/` magic is how
  * crawl readers mask corruption and lose records.
  *
  * Scale shape: parallelism is per-FILE (binaryFiles), the layout every
  * crawl pipeline uses — archives land as many ~1 GB files and records
  * inside one file parse sequentially (uncompressed WARC has no
  * sync-marker splitting; per-record gzip members, the Common Crawl
  * convention, would make it record-splittable — same seam, stricter
  * framing). Nothing is collected: parse is a flatMap from file bytes to
  * record rows. */
object WarcSource {

  /** Columns a parsed WARC response record surfaces. */
  val recordsSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("http_status", IntegerType),
    StructField("content_language", StringType),
    StructField("x_source", StringType),
    StructField("body", StringType)))

  private val FixedDate = "2026-01-01T00:00:00Z"

  /** Egress a documents table as WARC response records: each row becomes
    * one record whose HTTP payload is the [[graft.text.HtmlText]] fixture
    * page (lang rides in the standard `Content-Language` response header,
    * the source tag in an `X-Graft-Source` extension header, the doc id
    * in both the record id and the target URI). One `.warc` file per
    * input partition, written task-locally — no shuffle, no driver
    * materialization. */
  def write(df: DataFrame, path: String): Unit =
    writeWith(df, path, ".warc", identity)

  /** Shared writer body of [[write]]/[[writeGz]]: one `.warc`-family
    * file per input partition, each record's bytes through
    * `perRecord` (identity for plain, one-gzip-member for `.warc.gz`).
    *
    * Commit protocol: each task attempt writes an ATTEMPT-UNIQUE temp
    * file (`.part-<pid>.attempt-<taskAttemptId>`) and renames it to the
    * final name only after a clean close — so a retried or speculative
    * attempt never interleaves bytes with a zombie writing the same
    * final path, which would leave a torn archive the fail-loud reader
    * rejects. If the rename finds the final name already present, a
    * sibling attempt of the SAME deterministic partition won the race;
    * its bytes are identical by construction, so the loser just deletes
    * its temp. */
  private def writeWith(df: DataFrame, path: String, suffix: String,
      perRecord: Array[Byte] => Array[Byte], indexed: Boolean = false,
      publish: Boolean = true): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(conf.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    df.select("doc_id", "text", "lang", "source")
      .rdd.foreachPartition { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        if (it.hasNext) {
          val partFs = out.getFileSystem(conf.value)
          def commitTo(tmp: org.apache.hadoop.fs.Path,
              dst: org.apache.hadoop.fs.Path): Unit =
            if (!partFs.rename(tmp, dst)) {
              val won = partFs.exists(dst)
              partFs.delete(tmp, false)
              require(won,
                s"warc write: rename $tmp -> $dst failed with no " +
                  "committed sibling attempt")
            }
          val finalPart = new org.apache.hadoop.fs.Path(
            out, f"part-$pid%05d$suffix")
          val tmpPart = new org.apache.hadoop.fs.Path(
            out, f".part-$pid%05d.attempt-${tc.taskAttemptId()}$suffix")
          val os = partFs.create(tmpPart, true)
          val cdx = if (indexed) new StringBuilder else null
          var offset = 0L
          try it.foreach { row =>
            require(!row.anyNull,
              s"warc write: null field in row $row — doc_id/text/lang/" +
                "source must be non-null")
            val bytes = perRecord(recordBytes(row.getLong(0), row.getString(1),
              row.getString(2), row.getString(3)))
            os.write(bytes)
            if (indexed) {
              cdx.append(row.getLong(0)).append(' ').append(offset)
                .append(' ').append(bytes.length).append('\n')
              offset += bytes.length
            }
          } finally os.close()
          commitTo(tmpPart, finalPart)
          if (indexed) {
            val tmpCdx = new org.apache.hadoop.fs.Path(
              out, f".part-$pid%05d.attempt-${tc.taskAttemptId()}.cdx")
            val cs = partFs.create(tmpCdx, true)
            try cs.write(cdx.toString.getBytes(UTF_8)) finally cs.close()
            commitTo(tmpCdx,
              new org.apache.hadoop.fs.Path(out, f"part-$pid%05d.cdx"))
          }
        }
      }
    if (publish) indexAndPublish(spark, path)
  }

  /** Phase 2 of an archive egress: convert any text cdx sidecars to the
    * id-clustered parquet index, then write the commit marker — the
    * at-scale index form and the publish, as one driver-side step.
    *
    * The text cdx sidecars (CC's interchange shape, kept) convert ONCE
    * at write time to an id-clustered parquet layout — range-partitioned
    * + sorted by doc id, bloom on id (the
    * [[graft.search.IdFetch.writeIdClustered]] recipe) — so the
    * candidate resolve in [[fetchDocumentsById]] is itself a PRUNED
    * footer-stat scan. At one cdx line per record over a 100 TB crawl
    * the text scan is billions of rows per point fetch; the parquet
    * conversion makes resolve I/O ∝ touched row groups, not crawl size.
    *
    * PUBLISH: one driver-written marker after every task committed — the
    * [[graft.store.VersionedLayout]] pattern. The per-part temp+rename
    * protects against zombie attempts WITHIN the job; the marker is what
    * makes the archive directory safe where rename is copy+delete
    * (object stores): a job that crashed after committing SOME parts
    * leaves a directory indistinguishable from a complete one without
    * it. The marker records the committed part count, so the readers
    * also catch a part file lost after publish. Written AFTER the cdx
    * index conversion, so a publish is never visible without its index.
    *
    * Exposed (package-private) as its own phase so the bench ledger can
    * time the index conversion separately from the archive write — its
    * cost grows with crawl size and must stay individually visible. */
  private[graft] def indexAndPublish(spark: SparkSession, path: String): Unit = {
    val (fs, out) = graft.store.Fs.pathFs(spark, path)
    if (hasCdx(fs, out))
      graft.search.IdFetch.writeIdClustered(
        cdxTextEntries(spark, path), s"$path/$CdxIndexDir", "doc_id",
        numFiles = CdxIndexFiles)
    val nParts = fs.listStatus(out)
      .count(st => st.getPath.getName.matches("part-\\d+\\..*") &&
        !st.getPath.getName.endsWith(".cdx"))
    val ms = fs.create(new org.apache.hadoop.fs.Path(out, CommitMarker), true)
    try ms.write(s"$nParts\n".getBytes(UTF_8)) finally ms.close()
  }

  /** Directory-level commit marker: "<nParts>", written ONCE by the
    * driver after the archive-write job succeeds. */
  private[graft] val CommitMarker = "_graft_warc_committed"

  /** The id-clustered parquet form of the cdx sidecars (underscore
    * prefix: parquet/binaryFiles readers ignore it). */
  private[graft] val CdxIndexDir = "_cdx_index"
  private val CdxIndexFiles = 8

  /** Any text cdx sidecar under `dir`? An EMPTY indexed egress (no rows →
    * no parts → no cdx) must skip the index conversion — globbing zero
    * files is a read-time error — and an empty archive point-fetch must
    * short-circuit instead of scanning nothing. */
  private def hasCdx(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir)
      .exists(_.getPath.getName.endsWith(".cdx"))

  /** Parse every text cdx sidecar under `path` into
    * (doc_id, archive file NAME, offset, length) rows — the archive is
    * stored as a bare name so the index stays valid when the directory
    * moves. Shared by the index conversion and the text-scan fallback. */
  private def cdxTextEntries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // archive names resolve through ONE driver-side listing (stem → the
    // sibling archive file actually present), never an assumed `.warc.gz`
    // suffix: a hand-assembled plain-`.warc` + `.cdx` drop directory
    // (requireMarker = false interchange shape) must index to its real
    // files — and this mapping persists into `_cdx_index`, so a wrong
    // guess here would bake dead paths into the at-scale index
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val siblings = fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(n => n.contains(".warc") && !n.endsWith(".cdx"))
      .toSeq.groupBy(n => n.substring(0, n.indexOf(".warc")))
    siblings.find(_._2.size > 1).foreach { case (stem, names) =>
      throw new IllegalArgumentException(
        s"$path: ambiguous archives for cdx stem '$stem': " +
          names.sorted.mkString(", "))
    }
    val sib = spark.sparkContext.broadcast(siblings.map {
      case (stem, names) => stem -> names.head
    })
    spark.read.textFile(s"$path/*.cdx")
      .select(org.apache.spark.sql.functions.input_file_name().as("cdx"),
        org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
      .map { case (cdx, line) =>
        val f = line.split(' ')
        require(f.length == 3, s"$cdx: malformed cdx line '$line'")
        val stem = cdx.substring(cdx.lastIndexOf('/') + 1).stripSuffix(".cdx")
        val name = sib.value.getOrElse(stem, throw new IllegalArgumentException(
          s"$cdx: no sibling .warc archive for cdx stem '$stem'"))
        (f(0).toLong, name, f(1).toLong, f(2).toInt)
      }.toDF("doc_id", "archive", "offset", "length")
  }

  /** Gate a whole-directory read of an ENGINE-WRITTEN archive layout on
    * the commit marker; fail loudly naming it when absent or torn, and
    * when the committed part count no longer matches the listing. The
    * crawler-drop layout — archives landed file-by-file from an external
    * crawler, where arrival of each (internally fail-loud-framed) file IS
    * its publish — has no directory-level publish to enforce; readers
    * take `requireMarker = false` for that shape. */
  private def requireCommitted(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    val mp = new org.apache.hadoop.fs.Path(dir, CommitMarker)
    require(fs.exists(mp),
      s"$dir: no $CommitMarker marker — the archive directory was never " +
        "published (writer crashed mid-job); part files without the " +
        "marker are an incomplete torn publish (external crawler-drop " +
        "directories are read with requireMarker = false)")
    val in = fs.open(mp)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val nParts = graft.store.Fs.parseLongs(txt, 1).map(_.head).getOrElse(
      throw new IllegalArgumentException(
        s"$dir: torn $CommitMarker marker ('$txt') — publish crashed " +
          "mid-commit; rewrite the archive"))
    val got = fs.listStatus(dir)
      .count(st => st.getPath.getName.matches("part-\\d+\\..*") &&
        !st.getPath.getName.endsWith(".cdx"))
    require(got == nParts,
      s"$dir: marker committed $nParts part file(s), found $got — " +
        "archive file lost after publish")
  }

  private[graft] def recordBytes(docId: Long, text: String, lang: String,
      source: String): Array[Byte] = {
    val html = graft.text.HtmlText.pageStr(docId, text)
    val http =
      "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Language: $lang\r\n" +
        s"X-Graft-Source: $source\r\n" +
        "\r\n" + html
    val payload = http.getBytes(UTF_8)
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:graft:$docId>\r\n" +
        s"WARC-Date: $FixedDate\r\n" +
        s"WARC-Target-URI: https://$source.example/$lang/$docId\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
    val h = header.getBytes(UTF_8)
    val outBytes = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, outBytes, 0, h.length)
    System.arraycopy(payload, 0, outBytes, h.length, payload.length)
    outBytes(outBytes.length - 4) = '\r'; outBytes(outBytes.length - 3) = '\n'
    outBytes(outBytes.length - 2) = '\r'; outBytes(outBytes.length - 1) = '\n'
    outBytes
  }

  /** Egress as `.warc.gz` with each record its OWN gzip member — the
    * Common Crawl convention: a conforming reader can seek to a member
    * boundary and decompress one record without touching the rest, which
    * is what makes the compressed form record-addressable at scale. The
    * writer ALSO emits that address book: a CDX-style sidecar per
    * archive (`part-NNNNN.cdx`, one `docId offset length` line per
    * member) — CC's cdx shape — which [[fetchDocumentsById]] uses for
    * point reads that touch bytes proportional to the CANDIDATE COUNT,
    * never the crawl ([[graft.search.IdFetch]]'s discipline at the
    * archive layer). Full scans still decompress the member
    * CONCATENATION per file (gzip streams concatenate losslessly),
    * keeping per-file parallelism like the uncompressed path. */
  def writeGz(df: DataFrame, path: String): Unit = {
    writeGzArchives(df, path)
    indexAndPublish(df.sparkSession, path)
  }

  /** Phase 1 of the indexed egress: archive parts + text cdx sidecars,
    * NO commit marker — deliberately an unpublished directory until
    * [[indexAndPublish]] runs (readers reject it as a torn publish).
    * Split out so the bench ledger times the archive write and the cdx
    * index conversion as separate build steps; [[writeGz]] remains the
    * one-call publish for users. */
  private[graft] def writeGzArchives(df: DataFrame, path: String): Unit =
    writeWith(df, path, ".warc.gz", gzipMember, indexed = true,
      publish = false)

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Gunzip a member concatenation by WALKING the members ourselves —
    * never through `GZIPInputStream`'s concatenation mode, which treats a
    * malformed subsequent member header as clean EOF and silently
    * truncates everything after a corruption (measured: a bit-flip at a
    * member boundary decodes to a clean prefix with no exception —
    * exactly the resync-past-corruption failure this seam exists to
    * reject). Each member's header is parsed per RFC 1952 (magic, method
    * 8, FLG-gated extra/name/comment fields), its deflate body inflated
    * raw, and its CRC32 + ISIZE trailer VERIFIED; any violation fails
    * loudly with file + member offset. Plain (non-gzip) bytes pass
    * through untouched, so one reader serves both layouts. Output sizing
    * and offset arithmetic are Long-safe (a ~1 GB archive must not wrap
    * an Int). */
  private[graft] def maybeGunzip(file: String, bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, 64L * 1024 * 1024).toInt)
    var off = 0
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"warc parse: $msg in $file at member offset $off")
    def u8(i: Long): Int = {
      if (i < 0 || i >= bytes.length) fail("truncated gzip member")
      bytes(i.toInt) & 0xff
    }
    while (off < bytes.length) {
      if (u8(off) != 0x1f || u8(off + 1) != 0x8b) fail("bad gzip member magic")
      if (u8(off + 2) != 8) fail(s"unsupported gzip method ${u8(off + 2)}")
      val flg = u8(off + 3)
      var p: Long = off + 10L // fixed header
      if ((flg & 4) != 0) { val xlen = u8(p) | (u8(p + 1) << 8); p += 2 + xlen } // FEXTRA
      if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 }                  // FNAME
      if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 }                 // FCOMMENT
      if ((flg & 2) != 0) p += 2                                                 // FHCRC
      if (p >= bytes.length) fail("truncated gzip member")
      val inf = new java.util.zip.Inflater(/* nowrap = */ true)
      val crc = new java.util.zip.CRC32
      var memberLen = 0L
      try {
        inf.setInput(bytes, p.toInt, bytes.length - p.toInt)
        val buf = new Array[Byte](64 * 1024)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case e: java.util.zip.DataFormatException =>
              fail(s"corrupt deflate body (${e.getMessage})") }
          if (n == 0 && !inf.finished()) fail("truncated deflate body")
          out.write(buf, 0, n); crc.update(buf, 0, n); memberLen += n
        }
        val dataEnd = p + inf.getBytesRead
        // trailer: CRC32 + ISIZE (mod 2^32), little-endian
        val gotCrc = (0 until 4).map(i => u8(dataEnd + i).toLong << (8 * i)).sum
        val gotLen = (0 until 4).map(i => u8(dataEnd + 4 + i).toLong << (8 * i)).sum
        if (gotCrc != crc.getValue) fail("gzip member CRC mismatch")
        if (gotLen != (memberLen & 0xffffffffL)) fail("gzip member ISIZE mismatch")
        off = (dataEnd + 8).toInt
      } finally inf.end()
    }
    out.toByteArray
  }

  /** Parse every record of every `.warc`/`.warc.gz` file under `path`
    * into [[recordsSchema]] rows. `requireMarker = false` for external
    * crawler-drop directories (see [[requireCommitted]]). */
  def readRecords(spark: SparkSession, path: String,
      requireMarker: Boolean = true): DataFrame = {
    if (requireMarker) {
      val (fs, p) = graft.store.Fs.pathFs(spark, path)
      requireCommitted(fs, p)
    }
    val rows = spark.sparkContext.binaryFiles(s"$path/*.warc*")
      .flatMap { case (file, stream) =>
        parseFile(file, maybeGunzip(file, stream.toArray())) }
    spark.createDataFrame(rows, recordsSchema)
  }

  /** Ingest a WARC crawl back into canonical documents rows: HTML body →
    * byte-exact `<article>` recovery (the entity decode is the exact
    * inverse of the writer's escape), lang from `Content-Language`,
    * source from `X-Graft-Source`, doc_id from the record id, n_chars
    * recomputed — the full acquisition round trip the `src_warc_agg`
    * oracle hashes. */
  def readDocuments(spark: SparkSession, path: String,
      requireMarker: Boolean = true): DataFrame = {
    if (requireMarker) {
      val (fs, p) = graft.store.Fs.pathFs(spark, path)
      requireCommitted(fs, p)
    }
    val rows = spark.sparkContext.binaryFiles(s"$path/*.warc*")
      .flatMap { case (file, stream) => docsFromBytes(file, stream.toArray()) }
    spark.createDataFrame(rows, JsonlSource.documentsSchema)
  }

  /** Bounded point fetch over an INDEXED member-gzip crawl
    * ([[writeGz]]'s cdx sidecars): resolve the requested ids to
    * (archive, offset, length) triples through one pruned scan of the
    * cdx files, then read EXACTLY those byte ranges — one seek + one
    * member gunzip + one record parse per candidate, distributed over
    * the (bounded) candidate list. I/O ∝ |ids|, never the crawl size —
    * the [[graft.search.IdFetch]] two-stage discipline applied to the
    * archive layer (at production scale the text cdx converts to an
    * id-clustered parquet sidecar for footer-stat pruning of the index
    * scan itself; the text form here is CC's interchange shape).
    * Unknown ids are simply absent from the result (the caller's
    * candidate list is advisory, like an `IN` fetch). */
  def fetchDocumentsById(spark: SparkSession, path: String,
      ids: Seq[Long], requireMarker: Boolean = true): DataFrame = {
    import spark.implicits._
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    // engine-written archives carry the publish marker; hand-assembled
    // interchange layouts (external .warc.gz + .cdx dropped file-by-file)
    // take requireMarker = false like the whole-directory readers
    if (requireMarker) requireCommitted(fs, p)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], JsonlSource.documentsSchema)
    if (ids.isEmpty) return empty
    // candidate resolve: the id-clustered parquet index when the layout
    // carries one (every non-empty indexed write does) — a PRUNED `IN`
    // scan, row groups ∝ candidates — else one pass over the text cdx
    // (the interchange-shape fallback); an EMPTY archive (no cdx at all)
    // short-circuits, nothing to glob
    val idxPath = s"$path/$CdxIndexDir"
    val resolve =
      if (graft.store.Fs.exists(spark, idxPath))
        graft.search.IdFetch.fetchByIds(
          spark.read.parquet(idxPath), "doc_id", ids)
      else if (!hasCdx(fs, p)) return empty
      else cdxTextEntries(spark, path)
        .where(org.apache.spark.sql.functions.col("doc_id").isin(ids: _*))
    val entries = resolve
      .select("archive", "offset", "length", "doc_id").collect()
      .map(r => (s"$path/${r.getString(0)}", r.getLong(1), r.getInt(2),
        r.getLong(3)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext
      .parallelize(entries.toSeq, math.max(1, math.min(entries.length, 32)))
      .flatMap { case (file, offset, length, id) =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(conf.value)
        val bytes = new Array[Byte](length)
        val in = fs.open(p)
        try in.readFully(offset, bytes) finally in.close()
        val docs = docsFromBytes(file, maybeGunzip(file, bytes))
        require(docs.size == 1 && docs.head.getLong(0) == id,
          s"$file@$offset: cdx entry for $id does not frame exactly that record")
        docs
      }
    spark.createDataFrame(rows, JsonlSource.documentsSchema)
  }

  /** One file's bytes (plain or member-gzip) → canonical documents rows —
    * the task-side body shared by [[readDocuments]] and the streaming
    * acquisition twin ([[graft.streaming.StreamingIngest.warcIngest]]). */
  private[graft] def docsFromBytes(file: String, bytes: Array[Byte]): Seq[Row] =
    parseFile(file, maybeGunzip(file, bytes)).map { r =>
      val id = r.getString(0)
      require(id.startsWith("<urn:graft:") && id.endsWith(">"),
        s"warc ingest: unrecognized record id $id")
      val docId = id.stripPrefix("<urn:graft:").stripSuffix(">").toLong
      val body = r.getString(6)
      val open = body.indexOf("<article><p>")
      val close = body.indexOf("</p></article>")
      require(open >= 0 && close > open,
        s"warc ingest: record $id carries no article block")
      val text = graft.text.HtmlText.unescapeStr(
        body.substring(open + "<article><p>".length, close))
      Row(docId, text, r.getString(4), r.getString(5), text.length.toLong)
    }

  /** Sequential record parse of one file's bytes — fail loud with file +
    * offset on any framing violation. */
  private[graft] def parseFile(file: String, bytes: Array[Byte]): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"warc parse: $msg at $file:$pos")
    def line(): String = {
      val nl = indexOfCrlf(bytes, pos)
      if (nl < 0) fail("unterminated header line")
      val s = new String(bytes, pos, nl - pos, UTF_8)
      pos = nl + 2
      s
    }
    while (pos < bytes.length) {
      val magic = line()
      if (magic != "WARC/1.0" && magic != "WARC/1.1")
        fail(s"bad record magic '$magic'")
      val headers = scala.collection.mutable.Map.empty[String, String]
      var h = line()
      while (h.nonEmpty) {
        val sep = h.indexOf(':')
        if (sep < 0) fail(s"malformed header line '$h'")
        headers(h.substring(0, sep).trim.toLowerCase) =
          h.substring(sep + 1).trim
        h = line()
      }
      val warcType = headers.getOrElse("warc-type", fail("missing WARC-Type"))
      val recordId =
        headers.getOrElse("warc-record-id", fail("missing WARC-Record-ID"))
      val len = headers.get("content-length") match {
        // non-empty, digits only, and small enough that no downstream
        // Int arithmetic can wrap (an empty string passes forall; an
        // all-digit overflow would otherwise throw a bare
        // NumberFormatException with no file:offset context)
        case Some(v) if v.nonEmpty && v.length <= 9 && v.forall(_.isDigit) =>
          v.toInt
        case Some(v) => fail(s"invalid Content-Length '$v'")
        case None => fail("missing Content-Length")
      }
      if (pos.toLong + len + 4 > bytes.length)
        fail(s"payload of $len bytes overruns the file")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      if (bytes(pos) != '\r' || bytes(pos + 1) != '\n' ||
        bytes(pos + 2) != '\r' || bytes(pos + 3) != '\n')
        fail("missing \\r\\n\\r\\n record separator")
      pos += 4
      if (warcType == "response") {
        val (status, httpHeaders, body) = parseHttp(payload, fail)
        out += Row(recordId, warcType,
          headers.get("warc-target-uri").orNull, status,
          httpHeaders.get("content-language").orNull,
          httpHeaders.get("x-graft-source").orNull, body)
      } else {
        out += Row(recordId, warcType,
          headers.get("warc-target-uri").orNull, null, null, null,
          new String(payload, UTF_8))
      }
    }
    out.toSeq
  }

  private def parseHttp(payload: Array[Byte], fail: String => Nothing)
      : (Int, Map[String, String], String) = {
    var p = 0
    def line(): String = {
      val nl = indexOfCrlf(payload, p)
      if (nl < 0) fail("unterminated http header line")
      val s = new String(payload, p, nl - p, UTF_8)
      p = nl + 2
      s
    }
    val status = line()
    if (!status.startsWith("HTTP/")) fail(s"bad http status line '$status'")
    val parts = status.split(" ")
    if (parts.length < 2 || !parts(1).forall(_.isDigit))
      fail(s"bad http status line '$status'")
    val headers = scala.collection.mutable.Map.empty[String, String]
    var h = line()
    while (h.nonEmpty) {
      val sep = h.indexOf(':')
      if (sep < 0) fail(s"malformed http header '$h'")
      headers(h.substring(0, sep).trim.toLowerCase) = h.substring(sep + 1).trim
      h = line()
    }
    (parts(1).toInt, headers.toMap,
      new String(payload, p, payload.length - p, UTF_8))
  }

  private def indexOfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length - 1) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
      i += 1
    }
    -1
  }
}
