package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.operators.TokenShards
import graft.queries.PipelineQueries

/** Byte-level contract of the token-shard export: the `.bin` files equal a
  * first-principles in-JVM re-derivation of the pack (order, ids, pads,
  * shard slicing), the `.idx` sidecars carry the exact mmap arithmetic,
  * and every `pipe_pack_spans` manifest window maps to the identical token
  * slice inside its shard file. */
class TokenShardSpec extends SparkSpec {

  private val Cap = PipelineQueries.PackCap
  private val Files = PipelineQueries.TokenShardFiles

  // the shared per-dir layout the registered query serves from
  private lazy val layout = PipelineQueries.tokenShardLayout(spark, Sf0001)

  /** Driver-side mirror of [[TokenShards.tokId]]. */
  private def tokIdStr(tok: String): Int = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    ((java.lang.Long.parseLong(md5.take(15), 16) % Int.MaxValue) + 1).toInt
  }

  /** Driver-side mirror of [[graft.operators.SeqPack.packHash]]. */
  private def packHashStr(id: Long): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pack:$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5.take(15), 16)
  }

  /** The whole corpus's expected token-id stream, re-derived from first
    * principles: docs in canonical (shard, h, id) pack order, whitespace
    * tokens hashed, concatenated. */
  private lazy val expectedStream: Array[Int] = {
    val docs = VectorModel.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.sortBy { case (id, _) =>
        val h = packHashStr(id); (h % 32, h, id)
      }
      .flatMap { case (_, text) => text.split(" ", -1).map(tokIdStr) }
  }

  private def fileBytes(path: String): Array[Byte] = {
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    bytes
  }

  private def decodeInts(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  private def shardFiles(suffix: String): Seq[String] = {
    val (fs, p) = graft.store.Fs.pathFs(spark, layout)
    fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(suffix))
      .sorted.toSeq
  }

  test("shard bytes equal the first-principles pack: order, ids, pads, slicing") {
    val total = expectedStream.length.toLong
    val totalSeqs = (total + Cap - 1) / Cap
    val spf = (totalSeqs + Files - 1) / Files
    val padded = expectedStream ++
      Array.fill(((totalSeqs * Cap) - total).toInt)(TokenShards.PadId)
    val bins = shardFiles(".bin")
    assert(bins.size.toLong === (totalSeqs + spf - 1) / spf)
    bins.zipWithIndex.foreach { case (f, shard) =>
      val got = decodeInts(fileBytes(f))
      val a = (shard * spf * Cap).toInt
      val b = math.min(((shard + 1) * spf * Cap).toLong, totalSeqs * Cap).toInt
      assert(f.contains(f"shard-$shard%05d.bin"), s"unexpected file order: $f")
      assert(got === padded.slice(a, b),
        s"shard $shard bytes diverge from the re-derived pack")
    }
  }

  test("idx sidecars pin the mmap arithmetic and match their bin") {
    val total = expectedStream.length.toLong
    val totalSeqs = (total + Cap - 1) / Cap
    val spf = (totalSeqs + Files - 1) / Files
    val idxs = shardFiles(".idx")
    assert(idxs.size === shardFiles(".bin").size)
    idxs.zipWithIndex.foreach { case (f, shard) =>
      val (cap, firstSeq, offsets) = TokenShards.readIdx(spark, f)
      assert(cap === Cap)
      assert(firstSeq === shard * spf)
      val expectedN = math.min(spf, totalSeqs - shard * spf)
      assert(offsets.length.toLong === expectedN)
      offsets.zipWithIndex.foreach { case (o, k) =>
        assert(o === k.toLong * Cap * 4) }
      val binLen = fileBytes(f.stripSuffix(".idx") + ".bin").length.toLong
      assert(binLen === expectedN * Cap * 4,
        s"idx window count disagrees with bin size for shard $shard")
    }
  }

  test("BPE export: dense sorted vocab sidecar, ids in range, token/pad accounting") {
    val layoutBpe = PipelineQueries.bpeTokenShardLayout(spark, Sf0001)
    val root = layoutBpe.stripSuffix("/shards")
    // vocab sidecar: dense ids 1..V in token sort order — the artifact a
    // trainer loads next to the shards
    val vocab = spark.read.parquet(s"$root/vocab")
      .collect().map(r => r.getString(0) -> r.getInt(1)).sortBy(_._2)
    assert(vocab.nonEmpty)
    assert(vocab.map(_._2).toSeq === (1 to vocab.length),
      "vocab ids must be dense 1..V")
    assert(vocab.map(_._1).toSeq === vocab.map(_._1).sorted.toSeq,
      "vocab ids must follow token sort order")
    // decode every shard: ids within [0, V], non-pad total equals the
    // corpus BPE token count, pads equal the window+clamp slack
    val docs = VectorModel.documents(spark, Sf0001)
    val model = graft.text.Bpe.FixtureModel
    val realTokens = docs.agg(sum(
      graft.text.Bpe.bpeTokenCount(col("text"), model).cast("long")))
      .head.getLong(0)
    val clamped = docs.agg(sum(greatest(
      graft.text.Bpe.bpeTokenCount(col("text"), model).cast("long"), lit(1L))))
      .head.getLong(0)
    val totalSeqs = (clamped + Cap - 1) / Cap
    val (fs, p) = graft.store.Fs.pathFs(spark, layoutBpe)
    val decoded = fs.listStatus(p).map(_.getPath.toString)
      .filter(_.endsWith(".bin")).sorted
      .flatMap(f => decodeInts(fileBytes(f)))
    assert(decoded.length.toLong === totalSeqs * Cap)
    assert(decoded.forall(id => id >= 0 && id <= vocab.length),
      "decoded ids must be pad or vocab ids")
    assert(decoded.count(_ != TokenShards.PadId).toLong === realTokens,
      "non-pad cells must equal the corpus BPE token count")
    assert(decoded.count(_ == TokenShards.PadId).toLong ===
      totalSeqs * Cap - realTokens,
      "pads must equal final-window slack plus blank-doc clamp slots")
  }

  test("readWindow point-reads any global window identical to its byte slice") {
    val total = expectedStream.length.toLong
    val totalSeqs = (total + Cap - 1) / Cap
    val spf = (totalSeqs + Files - 1) / Files
    val padded = expectedStream ++
      Array.fill(((totalSeqs * Cap) - total).toInt)(TokenShards.PadId)
    // every window, including cross-file boundaries and the padded tail
    (0L until totalSeqs).foreach { seq =>
      val got = TokenShards.readWindow(spark, layout, seq)
      assert(got === padded.slice((seq * Cap).toInt, ((seq + 1) * Cap).toInt),
        s"window $seq point-read diverges")
    }
    // out-of-range fails loudly (missing shard file or out-of-idx window)
    intercept[Exception] {
      TokenShards.readWindow(spark, layout, totalSeqs + spf) }
  }

  test("every pipe_pack_spans manifest window maps to the identical shard slice") {
    val total = expectedStream.length.toLong
    val totalSeqs = (total + Cap - 1) / Cap
    val spf = (totalSeqs + Files - 1) / Files
    val docToks = VectorModel.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).map(tokIdStr))
      .toMap
    val starts = graft.operators.SeqPack.pack(
        VectorModel.documents(spark, Sf0001), "doc_id",
        graft.text.TextAnalysis.tokenCount(col("text")), Cap, 32)
      .select("doc_id", "start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binCache = scala.collection.mutable.Map.empty[Long, Array[Int]]
    def window(seq: Long): Array[Int] = {
      val shard = seq / spf
      val ints = binCache.getOrElseUpdate(shard, decodeInts(fileBytes(
        s"$layout/${f"shard-$shard%05d.bin"}")))
      val k = (seq - shard * spf).toInt
      ints.slice(k * Cap, (k + 1) * Cap)
    }
    val spans = PipelineQueries.packSpans(spark, Sf0001).collect()
    assert(spans.nonEmpty)
    var checked = 0
    spans.foreach { r =>
      val (doc, seq, a, b) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val w = window(seq)
      // the doc's token range occupying this window
      val docFrom = (seq * Cap + a - starts(doc)).toInt
      val docTo = (seq * Cap + b - starts(doc)).toInt
      val expected = docToks(doc).slice(docFrom, docTo + 1)
      assert(w.slice(a.toInt, b.toInt + 1) === expected,
        s"doc $doc window $seq [$a..$b] diverges from the manifest")
      checked += 1
    }
    info(s"verified $checked manifest spans against shard bytes")
  }

  test("batched point-reads equal per-window reads, in requested order, duplicates served") {
    val total = (expectedStream.length.toLong + Cap - 1) / Cap
    // a scattered, disordered, duplicate-carrying request — the shuffled
    // data-loader batch shape
    val req = Seq(total - 1, 0L, total / 2, 0L, total - 1, 1L % total)
      .filter(_ >= 0).filter(_ < total)
    val batch = TokenShards.readWindows(spark, layout, req)
    assert(batch.length === req.length)
    req.zip(batch).foreach { case (s, w) =>
      assert(w === TokenShards.readWindow(spark, layout, s),
        s"batched window $s diverges from the single point-read")
    }
    // empty request short-circuits; out-of-range fails loudly
    assert(TokenShards.readWindows(spark, layout, Nil) === Nil)
    val e = intercept[IllegalArgumentException](
      TokenShards.readWindows(spark, layout, Seq(total)))
    assert(e.getMessage.contains("outside the committed layout"))
  }

  test("windows-per-file past the int-addressable idx bound fails loudly up front") {
    // the bound is the largest `written` whose idx allocation
    // (magic 8 + 4 + 8 + 8 + 8·written bytes) still fits a JVM int
    assert(TokenShards.MaxSeqsPerFile === (Int.MaxValue - 28L) / 8L)
    // at the bound: fine
    TokenShards.checkSeqsPerFile(TokenShards.MaxSeqsPerFile, 4,
      4 * TokenShards.MaxSeqsPerFile)
    // one past: the misconfiguration (tiny numFiles over a huge corpus)
    // must fail before any bytes land, naming the fix
    val e = intercept[IllegalArgumentException] {
      TokenShards.checkSeqsPerFile(TokenShards.MaxSeqsPerFile + 1, 1,
        TokenShards.MaxSeqsPerFile + 1)
    }
    assert(e.getMessage.contains("raise numFiles"))
  }

  test("torn publish: shard files without the commit marker are rejected naming it") {
    val dir = graft.store.Fs.scratchDir(spark, "shards_torn") + "/shards"
    val docs = VectorModel.documents(spark, Sf0001)
      .orderBy("doc_id").limit(40)
    val (_, totalSeqs, spf) =
      TokenShards.write(docs, "doc_id", "text", Cap, 32, 3, dir)
    val (fs, p) = graft.store.Fs.pathFs(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(p, "_graft_shards_committed")
    assert(fs.exists(marker), "writer must publish a commit marker")
    val agg = TokenShards.readAggregates(spark, dir, Cap).collect()
    assert(agg.nonEmpty)
    assert(TokenShards.readWindow(spark, dir, 0L).length === Cap)
    // SIMULATED TORN PUBLISH: bin/idx files visible, marker never landed.
    // readWindow's gate is memoized per layout (point-read hot path), so
    // its missing-marker check runs on a SECOND layout no read ever
    // validated — the real torn-publish shape, where the marker never
    // existed to be memoized
    val dir2 = graft.store.Fs.scratchDir(spark, "shards_torn2") + "/shards"
    TokenShards.write(docs, "doc_id", "text", Cap, 32, 3, dir2)
    val (fs2, p2) = graft.store.Fs.pathFs(spark, dir2)
    fs2.delete(new org.apache.hadoop.fs.Path(p2, "_graft_shards_committed"),
      false)
    fs.delete(marker, false)
    Seq(
      () => TokenShards.readAggregates(spark, dir, Cap).count(),
      () => { TokenShards.readWindow(spark, dir2, 0L); 0L }
    ).foreach { read =>
      val e = intercept[IllegalArgumentException](read())
      assert(e.getMessage.contains("_graft_shards_committed"),
        s"torn publish must name the missing marker, got: ${e.getMessage}")
    }
    // a torn MARKER (crash between create and write) is also torn publish
    val ms = fs.create(marker, true); ms.close()
    val eTorn = intercept[IllegalArgumentException](
      TokenShards.readAggregates(spark, dir, Cap).count())
    assert(eTorn.getMessage.contains("torn"), eTorn.getMessage)
    // restore a healthy marker, then lose a shard file: the committed
    // window count pins the .bin set, so the loss is loud, never a
    // silently-shorter corpus
    val os = fs.create(marker, true)
    try os.write(s"$totalSeqs $spf $Cap\n".getBytes("UTF-8"))
    finally os.close()
    assert(TokenShards.readAggregates(spark, dir, Cap).collect() === agg)
    val lastBin = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".bin")).maxBy(_.getName)
    fs.delete(lastBin, false)
    val eLost = intercept[IllegalArgumentException](
      TokenShards.readAggregates(spark, dir, Cap).count())
    assert(eLost.getMessage.contains("lost"), eLost.getMessage)
  }

  test("in-place layout regeneration invalidates the point-read memo") {
    val dir = graft.store.Fs.scratchDir(spark, "shards_rewrite") + "/shards"
    val docs = VectorModel.documents(spark, Sf0001).orderBy("doc_id")
    val (_, seqsSmall, _) =
      TokenShards.write(docs.limit(8), "doc_id", "text", Cap, 32, 2, dir)
    // memoize the small layout's shape through a point read
    assert(TokenShards.readWindow(spark, dir, 0L).length === Cap)
    // regenerate a LARGER layout at the SAME path in the same JVM — the
    // public API supports this (writeCells deletes and rewrites); a stale
    // memo would keep serving the small (totalSeqs, seqsPerFile, cap) and
    // wrongly reject valid window ids of the rewritten layout
    val (_, seqsBig, _) =
      TokenShards.write(docs.limit(64), "doc_id", "text", Cap, 32, 2, dir)
    assert(seqsBig > seqsSmall, "rewrite must actually grow the layout")
    assert(TokenShards.readWindow(spark, dir, seqsBig - 1).length === Cap,
      "point reads after an in-place rewrite must serve the NEW layout shape")
  }

  test("trained-vocab capstone: shipped ids live in the trained vocabulary, pads account") {
    val shards = PipelineQueries.corpusShardTrainedLayout(spark, Sf0001)
    val vocab = spark.read.parquet(
      shards.stripSuffix("/shards") + "/vocab").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val v = vocab.size
    // dense ids 1..V by token sort order
    assert(vocab.values.toSeq.sorted === (1 to v))
    assert(vocab.keys.toSeq.sorted.map(vocab) === (1 to v))
    // the vocabulary IS the trained model's token set over the curated
    // chunks — the fixture/trained mixup this entry exists to preclude
    val model = graft.queries.TextQueries.bpeModel(spark, Sf0001)
    val trainedToks = PipelineQueries.trainCorpus(spark, Sf0001)
      .select(explode(
        graft.text.Bpe.bpeTokens(col("chunk"), model)).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(vocab.keySet === trainedToks,
      "vocab sidecar must rank exactly the trained-model token set")
    // every shipped non-pad id is a trained-vocab id; pad accounting
    // closes: slots = tokens + pads, windows tile the clamped counts
    val (fs, p) = graft.store.Fs.pathFs(spark, shards)
    var nonPad = 0L; var pads = 0L
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".bin")).foreach { bin =>
        val len = fs.getFileStatus(bin).getLen.toInt
        val bytes = new Array[Byte](len)
        val in = fs.open(bin)
        try in.readFully(0, bytes) finally in.close()
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until len / 4).foreach { i =>
          val id = bb.getInt(i * 4)
          if (id == TokenShards.PadId) pads += 1
          else { nonPad += 1
            assert(id >= 1 && id <= v, s"shipped id $id outside vocab 1..$v") }
        }
      }
    val counts = PipelineQueries.trainCorpus(spark, Sf0001)
      .select(greatest(graft.text.Bpe.bpeTokenCount(col("chunk"), model)
        .cast("long"), lit(1L)).as("n"),
        graft.text.Bpe.bpeTokenCount(col("chunk")
          , model).cast("long").as("raw"))
      .agg(sum("n"), sum("raw")).head
    val (clamped, raw) = (counts.getLong(0), counts.getLong(1))
    assert(nonPad === raw, "non-pad cells must equal the trained token mass")
    val totalSeqs = (clamped + Cap - 1) / Cap
    assert(nonPad + pads === totalSeqs * Cap,
      "shipped slots must tile the committed windows exactly")
    // the served aggregate view re-derives the same accounting
    val agg = PipelineQueries.corpusShardsTrained(spark, Sf0001)
      .agg(sum("n_seqs"), sum("n_tokens"), sum("n_pad")).head
    assert(agg.getLong(0) === totalSeqs)
    assert(agg.getLong(1) === nonPad)
    assert(agg.getLong(2) === pads)
    // the tokenizer rides with the shards: the merge-table artifact
    // reloads to exactly the model that produced the shipped ids
    val shipped = graft.text.Bpe.load(spark,
      shards.stripSuffix("/shards") + "/merges")
    assert(shipped.merges === model.merges,
      "shipped merge table must be the trained model, order-exact")
  }
}
