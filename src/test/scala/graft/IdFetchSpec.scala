package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.search.IdFetch

/** Gates the pruned re-rank fetch ([[graft.search.IdFetch]]) the
  * two-stage codecs (PCA, binary) serve through: the candidate `IN` list
  * actually reaches the parquet scan as a value-list pushdown, a
  * stats-pruning reader skips the files whose id range holds no
  * candidate, and the fetch is row-identical to the join probe it
  * replaced. */
class IdFetchSpec extends SparkSpec {

  private lazy val emb =
    VectorModel.embeddings(spark, Sf0001).select("vec_id", "embedding")

  private lazy val layoutPath: String = {
    val p = graft.store.Fs.scratchDir(spark, "idfetch_spec") + "/vecs"
    IdFetch.writeIdClustered(emb, p, "vec_id", numFiles = 32)
    p
  }

  test("candidate IN list survives to the scan as a pushed value filter") {
    // 400 ids — the ann_pca_topk budget, far past Spark's default
    // threshold of 10 where the pushed filter silently degrades to a
    // min/max range spanning the whole domain
    val ids = emb.select("vec_id").orderBy(md5(col("vec_id").cast("string")))
      .limit(graft.queries.ApproxQueries.PcaRerank)
      .collect().map(_.getLong(0)).toSeq
    val fetched = IdFetch.fetchByIds(spark.read.parquet(layoutPath), "vec_id", ids)
    val plan = fetched.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(vec_id"),
      s"expected a pushed In(vec_id, …) filter in the scan, got:\n$plan")
    assert(fetched.count() === ids.size.toLong)
    assert(spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
      === IdFetch.InFilterThreshold.toString)
  }

  test("stats pruning: a bounded scattered fetch touches ~|ids| files, not the corpus") {
    // 8 hash-scattered candidates over 32 id-disjoint files: a footer-stats
    // reader must touch at most 8 files (one per candidate) — the other
    // 24+ are skipped outright. This is the q_zorder_box measurement
    // applied to the point-fetch workload: at 100 TB the re-rank reads
    // row groups proportional to the CANDIDATE COUNT, never the corpus.
    val ids = emb.select("vec_id").orderBy(md5(col("vec_id").cast("string")))
      .limit(8).collect().map(_.getLong(0)).sorted.toSeq
    val stats = graft.operators.ZOrder.fileStats(
      spark.read.parquet(layoutPath), Seq("vec_id")).collect()
    assert(stats.length === 32, s"expected 32 files, got ${stats.length}")
    val touched = stats.count { r =>
      val (lo, hi) = (r.getLong(1), r.getLong(2))
      ids.exists(id => id >= lo && id <= hi)
    }
    assert(touched <= ids.size,
      s"stats reader touches $touched of ${stats.length} files for " +
        s"${ids.size} candidates — id clustering is not pruning")
    info(s"fetch of ${ids.size} ids: $touched/${stats.length} files touched, " +
      s"${stats.length - touched} skipped by footer stats")
    // and the clustering is what buys it: file id-ranges are disjoint
    val ranges = stats.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file id ranges overlap: $hiA >= $loB")
      case _ =>
    }
  }

  test("fetch == join probe, row for row; empty candidate set is empty") {
    val vecs = spark.read.parquet(layoutPath)
    val ids = emb.select("vec_id").orderBy(md5(col("vec_id").cast("string")))
      .limit(100).collect().map(_.getLong(0)).toSeq
    val viaFetch = IdFetch.fetchByIds(vecs, "vec_id", ids)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val spark2 = spark
    import spark2.implicits._
    val viaJoin = vecs.join(broadcast(ids.toDF("vec_id")), "vec_id")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(viaFetch === viaJoin)
    assert(IdFetch.fetchByIds(vecs, "vec_id", Seq.empty).count() === 0L)
    assert(IdFetch.fetchByIds(vecs, "vec_id", Seq.empty).schema === vecs.schema)
  }

  test("a candidate list past the pushdown threshold degrades gracefully, never wrongly") {
    // a caller-supplied rerank/topK big enough to exceed the threshold
    // must not turn a valid search into an exception: the filter still
    // applies post-scan (InSet), only the parquet pushdown falls back to
    // Spark's min/max range
    val vecs = spark.read.parquet(layoutPath)
    val all = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val tooMany = (all.toSeq ++
      (0 until IdFetch.InFilterThreshold).map(i => -1000000L - i))
    assert(tooMany.size > IdFetch.InFilterThreshold)
    val got = IdFetch.fetchByIds(vecs, "vec_id", tooMany)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(got === all, "over-threshold fetch must stay row-correct")
  }

  test("clustered layout round-trips content and writes id bloom filters") {
    val back = spark.read.parquet(layoutPath)
    assert(back.count() === emb.count())
    assert(back.agg(sum("vec_id")).head.getLong(0) ===
      emb.agg(sum("vec_id")).head.getLong(0))
    // bloom filter presence: assert via the parquet footer-level API that
    // at least the option landed — read one file's metadata through the
    // hadoop reader
    val conf = spark.sparkContext.hadoopConfiguration
    val hPath = new org.apache.hadoop.fs.Path(layoutPath)
    val f = hPath.getFileSystem(conf).listStatus(hPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val idChunk = (0 until rg.getColumns.size())
        .map(rg.getColumns.get)
        .find(_.getPath.toDotString == "vec_id")
        .getOrElse(fail("no vec_id column chunk"))
      assert(idChunk.getBloomFilterOffset >= 0,
        "vec_id column chunk carries no bloom filter")
    } finally reader.close()
  }

  test("after compaction mixes id ranges, the bloom layer carries the pruning") {
    // compaction of interleaved appends produces files whose id [min,max]
    // spans nearly the whole domain — the case the layout's bloom filters
    // exist for (IdFetch scaladoc). Model the worst case: scatter ids
    // across 4 files by id % 4 so every file's stats range covers every
    // candidate, then measure each pruning layer separately.
    val p = graft.store.Fs.scratchDir(spark, "idfetch_compact") + "/vecs"
    // one file per id%4 stripe, written deterministically (hash
    // repartitioning can leave empty partitions → fewer files)
    (0 until 4).foreach { b =>
      spark.read.parquet(layoutPath)
        .where(pmod(col("vec_id"), lit(4)) === b)
        .coalesce(1)
        .sortWithinPartitions("vec_id")
        .write.mode("append")
        .option("parquet.bloom.filter.enabled#vec_id", "true")
        .parquet(p)
    }
    val vecs = spark.read.parquet(p)
    val ids = emb.select("vec_id").orderBy(md5(col("vec_id").cast("string")))
      .limit(4).collect().map(_.getLong(0)).toSeq
    // correctness first: the IN fetch over the mixed layout stays exact
    val spark2 = spark
    import spark2.implicits._
    val viaFetch = IdFetch.fetchByIds(vecs, "vec_id", ids)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val viaJoin = vecs.join(broadcast(ids.toDF("vec_id")), "vec_id")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(viaFetch === viaJoin)
    // layer measurement over the parquet footers
    val conf = spark.sparkContext.hadoopConfiguration
    val hPath = new org.apache.hadoop.fs.Path(p)
    val files = hPath.getFileSystem(conf).listStatus(hPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length === 4)
    var statsTouched = 0; var bloomTouched = 0; var trueTouched = 0
    files.foreach { f =>
      val holds = spark.read.parquet(f.toString)
        .where(col("vec_id").isin(ids: _*)).count() > 0
      if (holds) trueTouched += 1
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        val perId = ids.map { id =>
          var statsHit = false; var bloomHit = false
          (0 until blocks.size()).foreach { bi =>
            val chunk = (0 until blocks.get(bi).getColumns.size())
              .map(blocks.get(bi).getColumns.get)
              .find(_.getPath.toDotString == "vec_id").get
            val st = chunk.getStatistics
              .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
            if (st.getMin <= id && id <= st.getMax) {
              statsHit = true
              val bloom = reader.getBloomFilterDataReader(blocks.get(bi))
                .readBloomFilter(chunk)
              assert(bloom != null, s"$f: missing bloom for vec_id")
              if (bloom.findHash(bloom.hash(id))) bloomHit = true
            }
          }
          (id, statsHit, bloomHit)
        }
        if (perId.exists(_._2)) statsTouched += 1
        if (perId.exists(_._3)) bloomTouched += 1
      } finally reader.close()
    }
    // the scattering defeated stats on purpose: stats touch MORE files
    // than actually hold a candidate...
    assert(statsTouched > trueTouched,
      s"range mixing did not defeat stats ($statsTouched vs $trueTouched true)")
    // ...no bloom false negatives: every file really holding a candidate
    // is bloom-positive...
    assert(bloomTouched >= trueTouched,
      s"bloom false negative: $bloomTouched touched < $trueTouched true")
    // ...and the bloom layer is what prunes — down to the truly-holding
    // files, modulo its false-positive rate
    assert(bloomTouched <= trueTouched + 1,
      s"bloom touched $bloomTouched files, only $trueTouched hold a candidate" +
        " — the bloom layer is not pruning")
    assert(bloomTouched < statsTouched,
      "bloom must prune strictly better than stats on a mixed-range layout")
    info(s"compacted layout: stats touches $statsTouched/${files.length} " +
      s"files, bloom narrows to $bloomTouched ($trueTouched truly hold)")
  }
}
