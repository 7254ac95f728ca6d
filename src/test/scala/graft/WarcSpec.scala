package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.sources.WarcSource
import graft.text.HtmlText

/** Gates the WARC acquisition seam ([[graft.sources.WarcSource]]) and the
  * HTML extraction chain ([[graft.text.HtmlText]]) beyond what the
  * src_warc_agg / tx_html_text hash oracles see: row-level round-trip
  * identity, the fail-loud framing contract, escape/decode inverses, and
  * the end-to-end feed into the cleaning pipeline. */
class WarcSpec extends SparkSpec {

  private lazy val docs = VectorModel.documents(spark, Sf0001)

  private def writeCorpus(): String = {
    val p = graft.store.Fs.scratchDir(spark, "warc_spec") + "/crawl"
    WarcSource.write(docs, p)
    p
  }

  test("round trip is row-identical in all five columns") {
    val p = writeCorpus()
    val back = WarcSource.readDocuments(spark, p)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val orig = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(back.length === orig.length)
    assert(back === orig)
  }

  test("records surface carries the http envelope") {
    val p = writeCorpus()
    val rec = WarcSource.readRecords(spark, p)
    assert(rec.count() === docs.count())
    val one = rec.where(col("record_id") === "<urn:graft:0>").head
    assert(one.getString(1) === "response")
    assert(one.getString(2).startsWith("https://"))
    assert(one.getInt(3) === 200)
    assert(one.getString(4) === docs.where(col("doc_id") === 0).head.getString(2))
    assert(one.getString(6).contains("<article><p>"))
  }

  test("html special characters in the text survive the round trip") {
    val spark2 = spark
    import spark2.implicits._
    // adversarial corpus: literal markup, pre-escaped entities (the
    // double-escape trap), the article close marker itself
    val tricky = Seq(
      (1L, "a < b && c > d", "en", "web", 14L),
      (2L, "already &amp;lt; escaped", "en", "web", 24L),
      (3L, "</p></article> inside text", "de", "web", 26L),
      (4L, "quotes \" and ' and & mix <tag>", "fr", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = graft.store.Fs.scratchDir(spark, "warc_tricky") + "/crawl"
    WarcSource.write(tricky, p)
    val back = WarcSource.readDocuments(spark, p).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back === tricky.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))))
  }

  test("member-gzip layout round-trips identically; each record is its own member") {
    val p = graft.store.Fs.scratchDir(spark, "warc_gz") + "/crawl"
    WarcSource.writeGz(docs, p)
    val hPath = new org.apache.hadoop.fs.Path(p)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(hPath).map(_.getPath)
      .filter(_.getName.endsWith(".warc.gz"))
    assert(parts.nonEmpty)
    // per-record members: decompressing member-by-member yields one
    // record each — the Common Crawl record-addressability property
    val in = fs.open(parts.head)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 64 * 1024, false)
      bos.toByteArray
    } finally in.close()
    // a second gzip magic after the first member's end proves multi-member
    // (single-member files put the magic only at offset 0)
    val nRecords = WarcSource.parseFile(parts.head.toString,
      WarcSource.maybeGunzip(parts.head.toString, bytes)).size
    if (nRecords > 1) {
      val magics = bytes.sliding(3).count(w =>
        (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b && (w(2) & 0xff) == 0x08)
      assert(magics >= nRecords,
        s"expected >= $nRecords gzip members, magic count $magics")
    }
    val back = WarcSource.readDocuments(spark, p)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val orig = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(back === orig)
    // a corrupt gzip stream fails loudly with the file named
    val e = intercept[IllegalArgumentException] {
      WarcSource.maybeGunzip("bad.warc.gz",
        Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 42, 42))
    }
    assert(e.getMessage.contains("bad.warc.gz"))
    // the silent-truncation trap: GZIPInputStream treats a malformed
    // SECOND member as clean EOF and returns only member 1 — the member
    // walk must fail loudly instead of losing every later record
    def member(payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(payload); gz.close(); bos.toByteArray
    }
    val good1 = member(WarcSource.recordBytes(1L, "first record", "en", "web"))
    val good2 = member(WarcSource.recordBytes(2L, "second record", "en", "web"))
    val joinedOk = good1 ++ good2
    assert(WarcSource.parseFile("two.warc.gz",
      WarcSource.maybeGunzip("two.warc.gz", joinedOk)).size === 2)
    val corrupt2 = joinedOk.clone()
    corrupt2(good1.length + 1) = 0x00 // break member 2's magic
    val e2 = intercept[IllegalArgumentException] {
      WarcSource.maybeGunzip("trunc.warc.gz", corrupt2)
    }
    assert(e2.getMessage.contains("trunc.warc.gz") &&
      e2.getMessage.contains(s"member offset ${good1.length}"),
      s"expected loud failure at the corrupt member, got: ${e2.getMessage}")
    // a flipped bit INSIDE a member's deflate body or trailer is caught
    // by the CRC verification
    val crcBad = joinedOk.clone()
    crcBad(crcBad.length - 6) = (crcBad(crcBad.length - 6) ^ 0x01).toByte // ISIZE
    val e3 = intercept[IllegalArgumentException] {
      WarcSource.maybeGunzip("crc.warc.gz", crcBad)
    }
    assert(e3.getMessage.contains("ISIZE") || e3.getMessage.contains("CRC"))
  }

  test("framing violations fail loudly with file and offset") {
    def mangle(f: Array[Byte] => Array[Byte]): Throwable = {
      val good = WarcSource.recordBytes(7L, "hello world", "en", "web")
      intercept[IllegalArgumentException] {
        WarcSource.parseFile("test.warc", f(good))
      }
    }
    // bad magic
    val e1 = mangle { b => b(4) = 'X'; b }
    assert(e1.getMessage.contains("bad record magic"))
    // truncated payload: chop the record mid-payload
    val e2 = mangle(b => java.util.Arrays.copyOfRange(b, 0, b.length - 20))
    assert(e2.getMessage.contains("overruns the file") ||
      e2.getMessage.contains("unterminated"))
    // missing record separator
    val e3 = mangle { b => b(b.length - 2) = 'x'; b }
    assert(e3.getMessage.contains("record separator"))
    // corrupt Content-Length
    val e4 = mangle { b =>
      val s = new String(b, UTF_8).replaceFirst("Content-Length: ",
        "Content-Length: x")
      s.getBytes(UTF_8)
    }
    assert(e4.getMessage.contains("invalid Content-Length"))
    // a valid non-response record parses through with null http fields
    val meta = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:graft:meta>\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n")
      .getBytes(UTF_8)
    val rows = WarcSource.parseFile("m.warc", meta)
    assert(rows.length === 1)
    assert(rows.head.getString(1) === "warcinfo")
    assert(rows.head.isNullAt(3))
  }

  test("escape/unescape are exact inverses; amp ordering handles double-escapes") {
    val cases = Seq("a&b", "&lt;", "&amp;lt;", "<x>&</x>", "plain",
      "&&&&", "a & b < c > d &amp; e")
    cases.foreach { s =>
      assert(HtmlText.unescapeStr(HtmlText.escapeStr(s)) === s, s"case '$s'")
    }
    // the escaped form never contains raw markup
    cases.foreach(s => assert(!HtmlText.escapeStr(s).exists(c => c == '<' || c == '>')))
  }

  test("extraction drops script/style/boilerplate bodies but keeps content text") {
    val spark2 = spark
    import spark2.implicits._
    val html =
      "<html><head><title>T</title><style>p{x:1}</style>" +
        "<script>var a = \"</p>fake\";</script></head><body>" +
        "<nav>skip me</nav><!-- no -->" +
        "<h1>Head</h1><p>one &amp; two</p><br><div>three</div>" +
        "<footer>skip too</footer></body></html>"
    val got = Seq(html).toDF("h")
      .select(HtmlText.extract(col("h")).as("t")).head.getString(0)
    assert(!got.contains("skip me") && !got.contains("skip too"))
    assert(!got.contains("fake") && !got.contains("x:1") && !got.contains("no"))
    assert(got.contains("Head") && got.contains("one & two") &&
      got.contains("three"))
    // block closes became line boundaries
    assert(got.linesIterator.toSeq.map(_.trim)
      .filter(_.nonEmpty).containsSlice(Seq("Head", "one & two", "three")))
  }

  test("cdx sidecars address every member exactly; point fetch == full-scan filter") {
    val p = graft.store.Fs.scratchDir(spark, "warc_cdx") + "/crawl"
    WarcSource.writeGz(docs, p)
    val hPath = new org.apache.hadoop.fs.Path(p)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdxs = fs.listStatus(hPath).map(_.getPath)
      .filter(_.getName.endsWith(".cdx")).sortBy(_.getName)
    assert(cdxs.nonEmpty, "member-gzip egress must write cdx sidecars")
    // offsets verified against member boundaries: entries tile the
    // archive exactly (sorted, contiguous, summing to the file length)
    // and each offset lands on a gzip member magic
    cdxs.foreach { cdx =>
      val arch = new org.apache.hadoop.fs.Path(
        cdx.toString.stripSuffix(".cdx") + ".warc.gz")
      val lines = scala.io.Source.fromInputStream(fs.open(cdx)).getLines()
        .map { l => val f = l.split(' '); (f(0).toLong, f(1).toLong, f(2).toLong) }
        .toSeq
      assert(lines.nonEmpty)
      var expect = 0L
      val in = fs.open(arch)
      try lines.foreach { case (id, off, len) =>
        assert(off === expect, s"$cdx: member for $id not contiguous")
        val magic = new Array[Byte](2)
        in.readFully(off, magic)
        assert((magic(0) & 0xff) === 0x1f && (magic(1) & 0xff) === 0x8b,
          s"$cdx: offset $off for $id is not a gzip member boundary")
        expect = off + len
      } finally in.close()
      assert(expect === fs.getFileStatus(arch).getLen,
        s"$cdx: entries do not tile the archive")
    }
    // point fetch: a scattered bounded id set comes back identical to the
    // full-scan filter, in all five columns
    val all = WarcSource.readDocuments(spark, p)
    val ids = all.select("doc_id").orderBy(md5(col("doc_id").cast("string")))
      .limit(7).collect().map(_.getLong(0)).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    val fetched = WarcSource.fetchDocumentsById(spark, p, ids)
    assert(rows(fetched) === rows(all.where(col("doc_id").isin(ids: _*))))
    // unknown ids are absent, empty list short-circuits
    assert(WarcSource.fetchDocumentsById(spark, p, Seq(-1L)).count() === 0)
    assert(WarcSource.fetchDocumentsById(spark, p, Nil).count() === 0)
    // ---- the at-scale resolve: id-clustered parquet cdx index ----
    val idx = s"$p/_cdx_index"
    assert(graft.store.Fs.exists(spark, idx),
      "indexed write must convert the cdx sidecars to the parquet index")
    val idxDf = spark.read.parquet(idx)
    // the index is exactly the text cdx, row for row
    assert(idxDf.count() === docs.count())
    // the IN resolve reaches the parquet scan as a pushed filter
    val plan = graft.search.IdFetch.fetchByIds(idxDf, "doc_id", ids)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(doc_id"),
      s"cdx resolve must push the id IN list into the scan:\n$plan")
    // IdFetchSpec-style pruning pin: the clustered layout gives every
    // file a tight DISJOINT id range, so footer stats admit at most ONE
    // file per candidate — resolve I/O ∝ candidates, never crawl size
    val conf = spark.sparkContext.hadoopConfiguration
    val idxPath = new org.apache.hadoop.fs.Path(idx)
    val pfs = idxPath.getFileSystem(conf)
    val pfiles = pfs.listStatus(idxPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    assert(pfiles.length > 1, "pruning needs a multi-file layout")
    ids.foreach { id =>
      var statHits = 0
      pfiles.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).foreach { bi =>
            val chunk = (0 until blocks.get(bi).getColumns.size())
              .map(blocks.get(bi).getColumns.get)
              .find(_.getPath.toDotString == "doc_id").get
            assert(chunk.getBloomFilterOffset >= 0,
              s"$f: doc_id column chunk carries no bloom filter")
            val st = chunk.getStatistics
              .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
            if (st.getMin <= id && id <= st.getMax) statHits += 1
          }
        } finally reader.close()
      }
      assert(statHits <= 1,
        s"candidate $id admitted by $statHits row groups — ranges overlap")
    }
  }

  test("<br> match is name-anchored: <brand …> is a tag strip, not a line break") {
    val spark2 = spark
    import spark2.implicits._
    // every legitimate br form breaks the line; a tag whose NAME merely
    // starts with "br" must fall through to the space replacement (the
    // r16 pattern <br[^>]*> turned <brand …> into a bogus paragraph
    // boundary on real crawl HTML)
    val html = "<p>a<br>b<br/>c<br />d<br class=\"x\">e<brand x=\"1\">f</p>"
    val got = Seq(html).toDF("h")
      .select(HtmlText.extract(col("h")).as("t")).head.getString(0)
    assert(got.linesIterator.toSeq === Seq("a", "b", "c", "d", "e f"),
      s"got lines ${got.linesIterator.toSeq}")
  }

  test("warc-ingested corpus feeds the cleaning pipeline identically") {
    // the acquisition story end-to-end: crawl → parse → extract →
    // the SAME rows the parquet documents table gives pipe_clean_corpus
    val p = writeCorpus()
    val fromWarc = WarcSource.readDocuments(spark, p)
    val viaWarc = graft.queries.PipelineQueries.cleanCorpusFrom(fromWarc)
      .collect().map(_.toSeq).toSeq
    val viaParquet = graft.queries.PipelineQueries.cleanCorpus(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaWarc === viaParquet)
  }

  test("torn publish: parts without the commit marker are rejected naming it") {
    val p = graft.store.Fs.scratchDir(spark, "warc_torn") + "/crawl"
    WarcSource.writeGz(docs, p)
    val hPath = new org.apache.hadoop.fs.Path(p)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, "_graft_warc_committed")
    assert(fs.exists(marker), "writer must publish a commit marker")
    val committed = WarcSource.readDocuments(spark, p).count()
    assert(committed === docs.count())
    // SIMULATED TORN PUBLISH: parts visible, marker never landed (the
    // object-store crash shape the marker exists for) — every
    // whole-directory reader must fail loudly naming the marker
    fs.delete(marker, false)
    Seq(
      () => WarcSource.readDocuments(spark, p).count(),
      () => WarcSource.readRecords(spark, p).count(),
      () => WarcSource.fetchDocumentsById(spark, p, Seq(1L)).count()
    ).foreach { read =>
      val e = intercept[IllegalArgumentException](read())
      assert(e.getMessage.contains("_graft_warc_committed"),
        s"torn publish must name the missing marker, got: ${e.getMessage}")
    }
    // the crawler-drop escape (externally-landed archives, no
    // directory-level publish) still reads — per-file framing is the gate
    assert(WarcSource.readDocuments(spark, p, requireMarker = false)
      .count() === committed)
    // ... and the point fetch has the same escape for hand-assembled
    // interchange layouts (resolves via the index or the text cdx)
    assert(WarcSource.fetchDocumentsById(spark, p, Seq(1L),
      requireMarker = false).count() === 1)
    // an EMPTY indexed egress publishes cleanly (no parts, no cdx, no
    // index conversion to choke on) and point-fetches to empty
    val pEmpty = graft.store.Fs.scratchDir(spark, "warc_empty") + "/crawl"
    WarcSource.writeGz(docs.where(org.apache.spark.sql.functions.lit(false)),
      pEmpty)
    assert(WarcSource.fetchDocumentsById(spark, pEmpty, Seq(1L)).count() === 0)
    // a torn MARKER (crash between create and write) is also a torn publish
    val ms = fs.create(marker, true); ms.close()
    val e2 = intercept[IllegalArgumentException](
      WarcSource.readDocuments(spark, p).count())
    assert(e2.getMessage.contains("torn"), e2.getMessage)
    // a part lost AFTER a healthy publish is caught by the count record
    val os = fs.create(marker, true)
    try os.write("99\n".getBytes(UTF_8)) finally os.close()
    val e3 = intercept[IllegalArgumentException](
      WarcSource.readDocuments(spark, p).count())
    assert(e3.getMessage.contains("lost"), e3.getMessage)
  }

  test("hand-assembled plain-.warc + .cdx drop dir resolves point fetches to real files") {
    // the interchange shape an external crawler drops: bare `.warc` (not
    // member-gzip) plus a cdx sidecar, no publish marker — the archive
    // name in the index must come from the sibling file actually present,
    // not an assumed `.warc.gz` suffix
    val dir = graft.store.Fs.scratchDir(spark, "warc_drop") + "/drop"
    val (fs, p) = graft.store.Fs.pathFs(spark, dir)
    fs.mkdirs(p)
    val rows = docs.orderBy("doc_id").limit(3).collect()
    val cdx = new StringBuilder
    var off = 0L
    val os = fs.create(new org.apache.hadoop.fs.Path(p, "part-00000.warc"), true)
    try rows.foreach { r =>
      val b = WarcSource.recordBytes(r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))
      os.write(b)
      cdx.append(r.getLong(0)).append(' ').append(off).append(' ')
        .append(b.length).append('\n')
      off += b.length
    } finally os.close()
    val cs = fs.create(new org.apache.hadoop.fs.Path(p, "part-00000.cdx"), true)
    try cs.write(cdx.toString.getBytes(UTF_8)) finally cs.close()
    val want = rows(1).getLong(0)
    val got = WarcSource.fetchDocumentsById(spark, dir, Seq(want),
      requireMarker = false).collect()
    assert(got.length === 1 && got(0).getLong(0) === want)
    assert(got(0).getString(1) === rows(1).getString(1))
  }
}
