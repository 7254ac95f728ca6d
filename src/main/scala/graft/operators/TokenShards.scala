package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Trainer-consumable token-shard export — the LAST MILE of the packing
  * family: materialize the concat-and-chunk placement
  * ([[SeqPack.pack]]/[[SeqPack.spans]]) into fixed-width binary token
  * shards plus a memory-mappable index sidecar, the `.bin`/`.idx` shape
  * a pretraining run actually consumes (the public Megatron/GPT-NeoX
  * convention: raw little-endian token ids, windows at fixed strides, an
  * index file a data loader mmaps to address window k without parsing).
  *
  * An extension past the reference (no export stage there); upstream of
  * this operator the repo already produces the placement manifest
  * (`pipe_pack_spans`) — this materializes it.
  *
  * Layout per shard file `shard-NNNNN.bin`: `seqsPerFile` consecutive
  * context windows (the last file may be shorter), each EXACTLY `cap`
  * int32 little-endian token ids; the final window of the corpus is
  * padded with [[PadId]]. Window k of the corpus lives in file
  * `k div seqsPerFile` at byte offset `(k mod seqsPerFile) * cap * 4` —
  * pure arithmetic addressing, which is what makes the shard mmap-able.
  * The `.idx` sidecar (`shard-NNNNN.idx`) pins the same arithmetic
  * explicitly: magic, cap, first window id, window count, then one int64
  * byte offset per window — a loader that mmaps offsets instead of
  * computing them reads these.
  *
  * Token ids: whitespace tokens through a deterministic 31-bit hash
  * ([[tokId]] — md5-derived like every other engine hash, mirrored
  * digit-for-digit by the DuckDB oracle). This is the TOKENIZER SEAM,
  * not a vocabulary claim: any encoder producing (doc, position, id)
  * swaps in above the window shuffle (the BPE fixture model in
  * [[graft.text.Bpe]] is the in-repo candidate); the export machinery —
  * global offsets, window assembly, shard files, index, fail-loud
  * contiguity — is the part that has to be right at 100 TB and is what
  * the oracle and spec gate.
  *
  * Scale shape: one token-stream shuffle keyed by window id (the
  * unavoidable reorder from document order to pack order), window
  * assembly as a bounded per-window aggregate (≤ `cap` cells), files
  * written task-parallel with hash co-location of each file's windows
  * and the attempt-unique temp + rename commit protocol
  * ([[graft.sources.WarcSource]]'s). The writer REQUIRES window
  * contiguity per file (a manifest gap — a missing window — fails the
  * task loudly rather than silently shifting every later window's
  * offset). */
object TokenShards {

  /** Pad id for the final partial window. Real ids are ≥ 1. */
  val PadId = 0

  /** 31-bit token id: md5-derived hash folded into [1, 2^31-1] — fits an
    * int32 with [[PadId]] = 0 reserved. */
  def tokId(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (graft.dedup.Dedup.hash60(tok) % Int.MaxValue + 1).cast("int")

  /** DuckDB mirror of [[tokId]] over a SQL expression. */
  def tokIdSql(tokExpr: String): String =
    s"CAST((('0x'||substr(md5($tokExpr),1,15))::BIGINT % ${Int.MaxValue} + 1) AS INTEGER)"

  private val IdxMagic = "GRFTIDX1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Windows-per-file ceiling: the largest `written` for which the idx
    * buffer allocation (`IdxMagic.length + 4 + 8 + 8 + 8·written`) still
    * fits a JVM int. ~268M windows per file — at cap 2048 that is ~2 TB
    * of tokens in ONE shard file, i.e. the bound only bites a
    * misconfiguration (tiny `numFiles` over a huge corpus), which
    * [[writeCells]] rejects up front. */
  private[graft] val MaxSeqsPerFile: Long = (Int.MaxValue - 28L) / 8L

  /** The idx buffer (8·written + header bytes) and the point-read window
    * arithmetic ([[readIdx]]/[[readWindow]]) address a file's windows with
    * JVM ints — a misconfigured small `numFiles` over a huge corpus must
    * fail HERE, loudly, before any bytes land, not wrap a buffer size at
    * commit. */
  private[graft] def checkSeqsPerFile(seqsPerFile: Long, numFiles: Int,
      totalSeqs: Long): Unit =
    require(seqsPerFile <= MaxSeqsPerFile,
      s"token shards: $numFiles file(s) over $totalSeqs windows is " +
        s"$seqsPerFile windows/file, past the int-addressable idx bound " +
        s"$MaxSeqsPerFile — raise numFiles")

  /** Export `docs` as token shards under `outPath` with the
    * whitespace-hash token ids ([[tokId]]). Returns
    * (totalTokens, totalSeqs, seqsPerFile). */
  def write(docs: DataFrame, idCol: String, textCol: String, cap: Int,
      packShards: Int, numFiles: Int, outPath: String): (Long, Long, Long) = {
    val base = docs.select(col(idCol).cast("long").as("doc"),
      col(textCol).as("__text"))
    // whitespace split structurally yields n ≥ 1 (split("", " ") is [""] —
    // a blank doc's single empty token is its one slot, so the cells side
    // below needs no synthetic pad cell); the clamp makes [[writeCells]]'s
    // n ≥ 1 precondition explicit instead of an implicit dependency on
    // that split behavior
    val counts = base.select(col("doc"),
      greatest(graft.text.TextAnalysis.tokenCount(col("__text")).cast("long"),
        lit(1L)).as("n"))
    val cells = base
      .select(col("doc"), posexplode(graft.text.TextAnalysis.tokens(col("__text")))
        .as(Seq("dpos", "tok")))
      .select(col("doc"), col("dpos"), tokId(col("tok")).as("id"))
    writeCells(counts, cells, cap, packShards, numFiles, outPath)
  }

  /** The encoder-agnostic export body — the TOKENIZER SEAM made
    * concrete: `counts` is (doc, n) with n ≥ 1 (a zero-token doc clamps
    * to one pad slot, [[SeqPack.pack]]'s precondition), `cells` is the
    * per-doc token stream (doc, dpos, id) with every doc contributing at
    * least one cell (a pad cell for blank docs keeps every window
    * non-empty so the fail-loud contiguity walk sees no phantom gaps).
    * Any encoder producing that shape — whitespace hash ids ([[write]]),
    * BPE vocab ids (`pipe_export_shards_bpe`), a real tokenizer — plugs
    * in above the one window-keyed shuffle. */
  def writeCells(counts: DataFrame, cells: DataFrame, cap: Int,
      packShards: Int, numFiles: Int, outPath: String): (Long, Long, Long) = {
    val spark = counts.sparkSession
    // `counts` is consumed by THREE actions below (the pack's shard-total
    // collect, the corpus-total aggregate, and the final write job's
    // offset window) — but it is only (doc, n), two longs per document,
    // while its LINEAGE can be an arbitrarily expensive encoder +
    // curation pipeline (the curated BPE exports re-derived the whole
    // corpus per action). Cache the small decision table once and let
    // every action serve from it; the corpus-sized `cells` stream still
    // flows exactly once, into the write job (guide §8: decide with
    // small rows, move big rows once).
    val countsC = graft.store.CacheRegistry.cached(counts)
    val packed = SeqPack.pack(countsC, "doc", col("n"), cap, packShards)
    val totalTokens = countsC.agg(sum(col("n"))).head.getLong(0)
    val totalSeqs = (totalTokens + cap - 1) / cap
    val seqsPerFile = (totalSeqs + numFiles - 1) / numFiles
    checkSeqsPerFile(seqsPerFile, numFiles, totalSeqs)
    // token stream in pack order: doc-local position + the doc's global
    // offset → window id and in-window offset; ONE shuffle keyed by seq
    val placed = cells
      .join(packed.select(col("doc"), col("start")), "doc")
      .select((col("start") + col("dpos")).as("p"), col("id"))
      .select(expr(s"p div $cap").as("seq"), (col("p") % cap).cast("int").as("off"),
        col("id"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(outPath)
    val fsRoot = out.getFileSystem(conf.value)
    if (fsRoot.exists(out)) fsRoot.delete(out, true)
    fsRoot.mkdirs(out)
    val totalSeqsB = totalSeqs
    val spfB = seqsPerFile
    val capB = cap
    // hash co-location: every window of a file lands in one task; a task
    // may own several complete files and walks them in (file, seq, off)
    // order, assembling windows AS IT STREAMS — the previous shape
    // aggregated cells per window (groupBy(seq) + collect_list) and then
    // repartitioned the assembled windows by file: TWO exchanges of the
    // whole token stream where one suffices, since the file-keyed sort
    // already delivers each window's cells contiguously (guide §2.4:
    // remove shuffles outright). Bytes landed are identical — same ids at
    // the same offsets, pads elsewhere, windows in the same order.
    placed.withColumn("file", expr(s"seq div $seqsPerFile"))
      .repartition(numFiles, col("file"))
      // id last: for a (hypothetical) duplicate offset the LAST write wins
      // below, and sorting ids too keeps that the larger id — exactly the
      // order the previous sort_array(struct(off, id)) assembly produced
      .sortWithinPartitions("file", "seq", "off", "id")
      .select("file", "seq", "off", "id")
      .foreachPartition { (it: Iterator[Row]) =>
        writeTaskCells(it, outPath, conf.value, capB, spfB, totalSeqsB)
      }
    // PUBLISH: one marker after every task committed — the
    // [[graft.store.VersionedLayout]] pattern. The per-file temp+rename
    // protects against zombie attempts WITHIN the job; the marker is what
    // makes the layout safe on object stores, where rename is copy+delete
    // and a crashed job leaves a partial file set indistinguishable from
    // a complete one. Readers gate on it ([[requireCommitted]]) and
    // cross-check the `.bin` count it implies, so a torn publish (parts
    // visible, no marker) or a lost shard file fails loudly instead of
    // serving a silently-shorter corpus.
    val ms = fsRoot.create(
      new org.apache.hadoop.fs.Path(out, CommitMarker), true)
    try ms.write(s"$totalSeqs $seqsPerFile $cap\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8)) finally ms.close()
    // the memo's soundness argument ("a marker is immutable once
    // published") holds for the in-repo scratch/versioned layouts, but
    // THIS method happily regenerates a layout at the same outPath (it
    // deletes and rewrites above) — drop any stale memo entry so point
    // reads in the same JVM see the rewritten (totalSeqs, seqsPerFile,
    // cap), not the shape of the overwritten layout
    committedMemo.remove(outPath)
    // every consumer of the counts cache (pack totals, corpus total, the
    // write job's offset join) has run — release it so the blocks don't
    // hold executor storage for the rest of the session
    graft.store.CacheRegistry.release(countsC)
    (totalTokens, totalSeqs, seqsPerFile)
  }

  /** Layout-level commit marker: "<totalSeqs> <seqsPerFile> <cap>",
    * written ONCE by the driver after the shard-write job succeeds. */
  private[graft] val CommitMarker = "_graft_shards_committed"

  /** Gate every batch read of a shard layout on the commit marker; fail
    * loudly naming it when absent or torn (a crash between the marker's
    * create and write leaves an empty file — that must read as an
    * unpublished layout, not wedge differently). Returns
    * (totalSeqs, seqsPerFile, cap). */
  private[graft] def requireCommitted(spark: SparkSession,
      outPath: String): (Long, Long, Int) = {
    val txt = graft.store.Fs.readSidecar(spark, s"$outPath/$CommitMarker")
      .getOrElse(throw new IllegalArgumentException(
        s"$outPath: no $CommitMarker marker — the layout was never " +
          "published (writer crashed mid-job) or the path is wrong; " +
          "shard files without the marker are an incomplete torn publish"))
    graft.store.Fs.parseLongs(txt, 3) match {
      case Some(Seq(t, s, c)) => (t, s, c.toInt)
      case _ => throw new IllegalArgumentException(
        s"$outPath: torn $CommitMarker marker ('$txt') — publish crashed " +
          "mid-commit; rewrite the layout")
    }
  }

  /** [[requireCommitted]] memoized per layout for the POINT-READ hot path
    * ([[readWindow]] is "one idx header + one ranged read" by contract —
    * two extra marker round-trips per training sample would dominate on
    * an object store). Sound because a marker is immutable once
    * published: layouts land under attempt-unique scratch dirs or
    * versioned roots, never rewritten in place. Batch reads
    * ([[readAggregates]]) stay unmemoized — one marker read per query
    * also re-verifies the file count. */
  private val committedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Int)]()

  private def requireCommittedMemo(spark: SparkSession,
      outPath: String): (Long, Long, Int) =
    committedMemo.computeIfAbsent(outPath, _ => requireCommitted(spark, outPath))

  /** One task's walk over its (file, seq, off)-ordered CELL rows: assemble
    * each window's fixed-width int32 LE block in place (pads where no
    * cell), write per-file `.bin` + `.idx` through attempt-unique temps,
    * rename on close. Fails loudly on any contiguity violation — a window
    * with no cells is a manifest gap (every doc contributes at least one
    * cell, so every committed window owns one) and surfaces as the same
    * out-of-order/short-count error the per-window walk raised. */
  private def writeTaskCells(it: Iterator[Row], outPath: String,
      hconf: org.apache.hadoop.conf.Configuration, cap: Int,
      seqsPerFile: Long, totalSeqs: Long): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    val out = new org.apache.hadoop.fs.Path(outPath)
    val fs = out.getFileSystem(hconf)
    var curFile = -1L
    var curSeq = -1L
    var written = 0L
    var os: org.apache.hadoop.fs.FSDataOutputStream = null
    var tmpBin: org.apache.hadoop.fs.Path = null
    val ids = new Array[Int](cap)
    val buf = java.nio.ByteBuffer.allocate(cap * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def flushWindow(): Unit = if (curSeq >= 0) {
      buf.clear()
      var i = 0
      while (i < cap) { buf.putInt(ids(i)); i += 1 }
      os.write(buf.array())
      written += 1
    }
    def commit(): Unit = if (curFile >= 0) {
      val expected = math.min(seqsPerFile, totalSeqs - curFile * seqsPerFile)
      require(written == expected,
        s"token shard $curFile: wrote $written windows, manifest expects " +
          s"$expected — window gap or duplicate")
      os.close()
      val finalBin = new org.apache.hadoop.fs.Path(out, f"shard-$curFile%05d.bin")
      commitRename(fs, tmpBin, finalBin)
      // idx sidecar: explicit mmap targets for the file's windows
      val idxBytes = java.nio.ByteBuffer
        .allocate(IdxMagic.length + 4 + 8 + 8 + 8 * written.toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      idxBytes.put(IdxMagic).putInt(cap)
        .putLong(curFile * seqsPerFile).putLong(written)
      (0L until written).foreach(k => idxBytes.putLong(k * cap * 4L))
      val tmpIdx = new org.apache.hadoop.fs.Path(out,
        f".shard-$curFile%05d.attempt-${tc.taskAttemptId()}.idx")
      val ios = fs.create(tmpIdx, true)
      try ios.write(idxBytes.array()) finally ios.close()
      commitRename(fs, tmpIdx,
        new org.apache.hadoop.fs.Path(out, f"shard-$curFile%05d.idx"))
    }
    it.foreach { row =>
      val (file, seq) = (row.getLong(0), row.getLong(1))
      if (file != curFile || seq != curSeq) {
        flushWindow()
        if (file != curFile) {
          commit()
          curFile = file; written = 0L
          tmpBin = new org.apache.hadoop.fs.Path(out,
            f".shard-$curFile%05d.attempt-${tc.taskAttemptId()}.bin")
          os = fs.create(tmpBin, true)
        }
        require(seq == curFile * seqsPerFile + written,
          s"token shard $curFile: window $seq out of order or missing " +
            s"predecessor (expected ${curFile * seqsPerFile + written})")
        curSeq = seq
        java.util.Arrays.fill(ids, PadId)
      }
      ids(row.getInt(2)) = row.getInt(3)
    }
    flushWindow()
    commit()
  }

  /** Rename-on-success with the lost-race-to-identical-sibling rule
    * ([[graft.sources.WarcSource]]'s commit protocol). */
  private def commitRename(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(tmp, dst)) {
      val won = fs.exists(dst)
      fs.delete(tmp, false)
      require(won, s"token shard commit: rename $tmp -> $dst failed with " +
        "no committed sibling attempt")
    }

  /** Re-read the exported shards and aggregate per file — the ROUND-TRIP
    * view the driver oracle gates: every count and the id sum are
    * re-derived from the shard BYTES, so any layout defect (wrong order,
    * wrong width, wrong endianness, shifted window) changes the hash. */
  def readAggregates(spark: SparkSession, outPath: String, cap: Int): DataFrame = {
    val (totalSeqs, spf, capM) = requireCommitted(spark, outPath)
    require(capM == cap,
      s"$outPath: layout committed at cap $capM, read requested cap $cap")
    // the marker pins the exact .bin count — a lost shard file (partial
    // object-store copy, manual deletion) must not read as a shorter
    // corpus
    val expectFiles = if (totalSeqs == 0) 0L else (totalSeqs + spf - 1) / spf
    val (fsL, root) = graft.store.Fs.pathFs(spark, outPath)
    val gotFiles = fsL.listStatus(root)
      .count(st => st.getPath.getName.matches("shard-\\d+\\.bin"))
    require(gotFiles == expectFiles,
      s"$outPath: marker expects $expectFiles shard file(s), found " +
        s"$gotFiles — shard file lost or publish torn")
    if (totalSeqs == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], aggregatesSchema)
    val rows = spark.sparkContext.binaryFiles(s"$outPath/*.bin")
      .map { case (name, stream) =>
        val bytes = stream.toArray()
        require(bytes.length % (cap * 4) == 0,
          s"$name: ${bytes.length} bytes is not a whole number of $cap-token windows")
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val shard = name.replaceAll(".*shard-(\\d+)\\.bin$", "$1").toLong
        var nTok = 0L; var idSum = 0L
        var i = 0
        val n = bytes.length / 4
        while (i < n) {
          val id = bb.getInt(i * 4)
          if (id != PadId) nTok += 1
          idSum += id
          i += 1
        }
        Row(shard, (n / cap).toLong, nTok, n - nTok, idSum)
      }
    spark.createDataFrame(rows, aggregatesSchema).orderBy("shard")
  }

  private val aggregatesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("shard",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_seqs",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_pad",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("id_sum",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** Point-read ONE context window by its global id — the data-loader
    * access pattern the layout exists for: window `seq` lives in file
    * `seq div seqsPerFile` at the byte offset its `.idx` pins, so the
    * read is one idx header + one `cap·4`-byte ranged read, never a
    * shard scan. `seqsPerFile` is self-describing (file 0's idx window
    * count — every file but the last holds exactly that many). */
  def readWindow(spark: SparkSession, outPath: String, seq: Long): Array[Int] = {
    require(seq >= 0, s"window id $seq")
    val (totalSeqs, spfM, _) = requireCommittedMemo(spark, outPath)
    require(seq < totalSeqs,
      s"$outPath: window $seq outside the committed layout ($totalSeqs windows)")
    val (cap0, first0, offs0) = readIdx(spark, f"$outPath/shard-${0}%05d.idx")
    require(first0 == 0, s"$outPath: file 0 idx starts at $first0")
    val spf = offs0.length.toLong
    require(spf == spfM || totalSeqs <= spf,
      s"$outPath: file 0 idx carries $spf windows, marker says $spfM per file")
    val shard = seq / spf
    val (cap, firstSeq, offsets) =
      if (shard == 0) (cap0, first0, offs0)
      else readIdx(spark, f"$outPath/shard-$shard%05d.idx")
    val k = (seq - firstSeq).toInt
    require(k >= 0 && k < offsets.length,
      s"$outPath: window $seq outside shard $shard's ${offsets.length} windows")
    val (fs, bin) = graft.store.Fs.pathFs(spark,
      f"$outPath/shard-$shard%05d.bin")
    val bytes = new Array[Byte](cap * 4)
    val in = fs.open(bin)
    try in.readFully(offsets(k), bytes) finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(cap)(bb.getInt)
  }

  /** Batched point-read — the shape a training data loader actually
    * issues (a batch of window ids per step, commonly scattered by a
    * shuffle like `pipe_shuffle_shards`): windows grouped by owning
    * shard file, ONE idx read and ONE open stream per touched file, the
    * file's windows fetched in ascending byte order (sequential-friendly
    * on spinning/object storage; on an object store this is one ranged
    * GET per window over few connections instead of per-window
    * open/close). Returns windows in the REQUESTED order. Duplicate ids
    * are served from the first fetch. */
  def readWindows(spark: SparkSession, outPath: String,
      seqs: Seq[Long]): Seq[Array[Int]] = {
    if (seqs.isEmpty) return Nil
    val (totalSeqs, spfM, _) = requireCommittedMemo(spark, outPath)
    seqs.foreach { s =>
      require(s >= 0 && s < totalSeqs,
        s"$outPath: window $s outside the committed layout ($totalSeqs windows)")
    }
    val spf = spfM // the marker carries the layout constant directly
    val got = scala.collection.mutable.Map.empty[Long, Array[Int]]
    seqs.distinct.groupBy(_ / spf).toSeq.sortBy(_._1).foreach {
      case (shard, shardSeqs) =>
        val (cap, firstSeq, offsets) =
          readIdx(spark, f"$outPath/shard-$shard%05d.idx")
        val (fs, bin) = graft.store.Fs.pathFs(spark,
          f"$outPath/shard-$shard%05d.bin")
        val in = fs.open(bin)
        try shardSeqs.sorted.foreach { s =>
          val k = (s - firstSeq).toInt
          require(k >= 0 && k < offsets.length,
            s"$outPath: window $s outside shard $shard's ${offsets.length} windows")
          val bytes = new Array[Byte](cap * 4)
          in.readFully(offsets(k), bytes)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          got(s) = Array.fill(cap)(bb.getInt)
        } finally in.close()
    }
    seqs.map(got)
  }

  /** Parse one `.idx` sidecar (driver-side; spec + loader use). Returns
    * (cap, firstSeq, offsets). */
  private[graft] def readIdx(spark: SparkSession, path: String): (Int, Long, Array[Long]) = {
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](IdxMagic.length)
    bb.get(magic)
    require(java.util.Arrays.equals(magic, IdxMagic),
      s"$path: bad idx magic")
    val cap = bb.getInt
    val firstSeq = bb.getLong
    val nSeqs = bb.getLong
    val offsets = Array.fill(nSeqs.toInt)(bb.getLong)
    require(!bb.hasRemaining, s"$path: trailing bytes after offset table")
    (cap, firstSeq, offsets)
  }
}
