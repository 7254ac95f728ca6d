package graft

import scala.util.chaining._
import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR on local[SPARK_GRAFT_CPUS], printing ONE JSON line.
  *
  * Persisted-index layouts (IVF cluster partitions, HNSW graphs, the
  * point-lookup layout) are built in an explicit pre-phase, timed as
  * `build_*` entries — so the serving queries time SERVING, not first-call
  * fit+write (the build-once/serve-many lifecycle a deployment has).
  *
  * Query failures are NOT swallowed: a failing query logs its stack trace
  * to stderr, contributes its elapsed time, and is surfaced in the JSON
  * as `failures`/`failed` — a broken query can't masquerade as a fast one.
  *
  * The JSON also carries environment evidence (`env`): system load average
  * and count of co-resident JVMs at start and end, plus the core count —
  * so a CONTENDED run (load ≫ cores claimed by this JVM, or extra JVMs
  * competing for them) is self-identifying from the artifact alone, and a
  * clean run proves its own cleanliness.
  */
object Bench {

  private def loadAvg: Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Running JVMs on this host (the jps snapshot, via /proc — a second
    * sbt/Spark JVM is the usual source of bench contention). Matches the
    * EXECUTABLE token only (first NUL-separated cmdline field equals
    * "java" or ends with "/java"), so a non-JVM process whose arguments
    * merely mention java (a script path, .js tooling) doesn't inflate the
    * count. -1 if /proc is unavailable. */
  private def javaProcs: Int =
    try {
      Option(new java.io.File("/proc").listFiles()).map(_.count { f =>
        f.getName.forall(_.isDigit) && {
          try {
            val exe = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"/proc/${f.getName}/cmdline")))
              .takeWhile(_ != '\u0000')
            exe == "java" || exe.endsWith("/java")
          } catch { case _: Throwable => false }
        }
      }).getOrElse(-1)
    } catch { case _: Throwable => -1 }

  /** Pre-build steps, keyed by the serving queries that depend on them. */
  private val buildSteps: Seq[(String, Set[String], (SparkSession, String) => Unit)] = Seq(
    ("build_ivf_layout",
      Set("vq_ivf_stored_topk", "vq_ivf_batch_topk", "vq_ivf_parity_topk",
        "vq_ivf_bigbatch", "vq_ivf_bigbatch_filtered"),
      // sizes warm here too: the adaptive query's probing statistic is
      // build-time state, not serving work to be timed
      (s, d) => { queries.ApproxQueries.ivfLayout(s, d)
        queries.ApproxQueries.ivfSizes(s, d); () }),
    ("build_hnsw_layout", Set("vq_hnsw_stored_topk", "vq_hnsw_stored_batch"),
      (s, d) => { queries.ApproxQueries.hnswLayout(s, d); () }),
    ("build_hnsw_routed_layout", Set("vq_hnsw_routed_topk", "vq_hnsw_routed_batch", "vq_hnsw_routed_bigbatch"),
      (s, d) => { queries.ApproxQueries.hnswRoutedLayout(s, d); () }),
    ("build_point_layout", Set("vq_get_by_id"),
      (s, d) => { queries.VectorQueries.pointLayout(s, d); () }),
    ("build_asof_root", Set("vq_asof_read"),
      // three commit-marker merges land here (build-time state); the
      // serving entry times the pinned-version read + aggregate only
      (s, d) => { queries.VectorQueries.asofRoot(s, d); () }),
    ("build_ivfpq_layout", Set("ann_ivfpq_topk", "ann_ivfpq_batch_topk", "ann_ivfpq_bigbatch"),
      // sizes warm here too (the adaptive bigbatch entry's probing
      // statistic is build-time state, like the IVF/LSH sizes)
      (s, d) => { queries.ApproxQueries.ivfPqLayout(s, d)
        queries.ApproxQueries.ivfPqSizes(s, d); () }),
    ("build_lsh_layout", Set("ann_lsh_topk", "ann_lsh_batch_topk", "ann_lsh_bigbatch"),
      // bucket sizes warm here too: the adaptive probe walk's mass
      // statistic is build-time state, like the IVF sizes above
      (s, d) => { queries.ApproxQueries.lshLayout(s, d)
        queries.ApproxQueries.lshSizes(s, d); () }),
    ("build_pq_codes", Set("ann_pq_adc_topk"),
      (s, d) => { queries.ApproxQueries.pqCodesLayout(s, d); () }),
    ("build_opq_codes", Set("ann_opq_adc_topk"),
      (s, d) => { queries.ApproxQueries.opqCodesLayout(s, d); () }),
    ("build_sq_codes", Set("ann_sq_topk"),
      (s, d) => { queries.ApproxQueries.sqCodesLayout(s, d); () }),
    ("build_bin_codes", Set("ann_bin_topk", "ann_bin_batch_topk"),
      (s, d) => { queries.ApproxQueries.binCodesLayout(s, d); () }),
    ("build_vec_id_layout",
      Set("ann_bin_topk", "ann_bin_batch_topk",
        "ann_pca_topk", "ann_pca_batch_topk",
        "ann_ivfpq_topk", "ann_ivfpq_batch_topk"),
      // the id-clustered re-rank fetch target (range-partitioned + sorted
      // by vec_id, bloom on the id column); the serving entries time the
      // coarse scan + PRUNED candidate fetch, not the clustering write
      (s, d) => { queries.ApproxQueries.vecByIdLayout(s, d); () }),
    ("build_warc_layout", Set("src_warc_agg", "pipe_crawl_corpus"),
      // the crawl egress is build state; the serving entries time the
      // fail-loud parse + article recovery (+ cleaning), not the write
      (s, d) => { queries.TextQueries.warcLayoutPath(s, d); () }),
    ("build_warc_gz_layout", Set("src_warc_gz", "src_warc_fetch"),
      // PHASE 1 of the member-gzip egress: archive parts + text cdx
      // sidecars (unpublished); the serving entries time the member-walk
      // read and the pruned point fetch respectively
      (s, d) => { queries.TextQueries.warcGzArchivesPath(s, d); () }),
    ("build_warc_cdx_index", Set("src_warc_gz", "src_warc_fetch"),
      // PHASE 2, ledgered separately: cdx→parquet id-clustered index
      // conversion + commit marker — its cost grows with crawl size and
      // must stay individually visible (r18 folded it into the archive
      // write and the combined entry read as a 2.4× regression)
      (s, d) => { queries.TextQueries.warcGzLayoutPath(s, d); () }),
    ("build_zorder_layout", Set("q_zorder_box"),
      (s, d) => { queries.AnalyticsQueries.zorderLayout(s, d); () }),
    ("build_sig_layout",
      Set("dd_minhash_lsh", "dd_ngram_capped", "dd_components",
        "dd_quality_keepers",
        "pipe_curated_mix", "pipe_train_corpus", "pipe_rag_e2e",
        "pipe_split_leakproof", "dd_incremental_lsh",
        "pipe_decontaminate_fuzzy", "pipe_train_corpus_fuzzy",
        "pipe_audit", "dd_dup_mass", "pipe_split_audit"),
      (s, d) => { queries.DedupQueries.sigLayout(s, d); () }),
    ("build_pair_layout",
      Set("dd_ngram_capped", "dd_components", "dd_quality_keepers",
        "pipe_curated_mix",
        "pipe_train_corpus", "pipe_rag_e2e", "pipe_split_leakproof",
        "pipe_train_corpus_fuzzy", "pipe_audit", "dd_dup_mass", "pipe_split_audit"),
      (s, d) => { queries.DedupQueries.pairLayout(s, d); () }),
    ("build_component_layout",
      Set("dd_components", "dd_quality_keepers", "pipe_curated_mix",
        "pipe_split_leakproof", "pipe_train_corpus",
        "pipe_train_corpus_fuzzy", "pipe_train_corpus_semantic",
        "pipe_rag_e2e", "pipe_audit", "dd_dup_mass", "pipe_split_audit"),
      // the star-contraction over the persisted pair layout is
      // build-time state; every component consumer serves from a scan
      // of the materialized (doc_id, component) assignment
      (s, d) => { queries.DedupQueries.componentLayout(s, d); () }),
    ("build_corpus_shards_bpe", Set("pipe_corpus_shards_bpe"),
      // curated chunks -> BPE vocab-id shards: encode + vocab ranking +
      // write are build egress; the serve is the round-trip decode
      (s, d) => { queries.PipelineQueries.corpusShardBpeLayout(s, d); () }),
    ("build_corpus_shards_trained", Set("pipe_corpus_shards_trained"),
      // the corpus-TRAINED twin: BPE training + trained encode + vocab
      // ranking + write are build egress; the serve is the decode
      (s, d) => { queries.PipelineQueries.corpusShardTrainedLayout(s, d); () }),
    ("build_corpus_shards", Set("pipe_corpus_shards"),
      // the curated-corpus export (train-corpus chunks -> binary
      // shards) is build-time egress; the serving entry times the
      // round-trip decode + aggregate
      (s, d) => { queries.PipelineQueries.corpusShardLayout(s, d); () }),
    ("build_token_shards_bpe", Set("pipe_export_shards_bpe"),
      // BPE encode + vocab ranking + shard write are build-time egress;
      // the serving entry times the round-trip decode + aggregate
      (s, d) => { queries.PipelineQueries.bpeTokenShardLayout(s, d); () }),
    ("build_token_shards", Set("pipe_export_shards"),
      // the packing manifest materialized as binary token shards is
      // build-time egress; the serving entry times the round-trip
      // decode + aggregate, not the export write
      (s, d) => { queries.PipelineQueries.tokenShardLayout(s, d); () }),
    ("build_mllib_lsh_model", Set("dd_mllib_lsh"),
      (s, d) => { queries.DedupQueries.mllibLshModel(s, d); () }),
    ("build_emb_pair_layout", Set("dd_embedding_ivf", "dd_semantic_ivf"),
      (s, d) => { queries.DedupQueries.embPairLayout(s, d); () }),
    ("build_incr_component_layout", Set("dd_components_incremental"),
      // the delta-re-propagation maintenance path: prior fixed point
      // from half the pair layout + incremental propagation of the
      // other half; the serving entry is a scan hash-gated against the
      // SAME oracle as dd_components
      (s, d) => { queries.DedupQueries.incrComponentLayout(s, d); () }),
    ("build_semantic_cc_layout", Set("dd_semantic_keepers"),
      // exact-cosine pair discovery + contraction, persisted; the
      // serving entry is a scan + kept flag
      (s, d) => { queries.DedupQueries.semanticCcLayout(s, d); () }),
    ("build_semantic_cc_ivf_layout", Set("dd_semantic_ivf"),
      (s, d) => { queries.DedupQueries.semanticCcIvfLayout(s, d); () }),
    ("build_embed_model", Set("tx_embed_local"),
      (s, d) => { queries.TextQueries.localModelPath(s, d); () }),
    ("build_domain_model", Set("pipe_domain_mix", "pipe_diverse_sample"),
      // hash-priority doc sample FIRST, then embed only the winners +
      // seeded k-means; the serving entry times assignment + mixing
      (s, d) => { queries.PipelineQueries.domainModel(s, d); () }),
    ("build_dsir_model", Set("pipe_dsir_sample", "pipe_dsir_mix"),
      // two bounded bucket-count aggregates + driver quantization; the
      // serving entry times SCORING + acceptance, not the fit
      (s, d) => { queries.PipelineQueries.dsirModel(s, d); () }),
    ("build_quality_model", Set("tx_quality_model", "pipe_quality_mix", "pipe_dsir_mix"),
      // hashed-feature LR fit on the planted fixture sample; the serving
      // entry times SCORING under the quantized weights, not training
      (s, d) => { queries.TextQueries.qualityModel(s, d); () }),
    ("build_pca_layout", Set("ann_pca_topk", "ann_pca_batch_topk"),
      // sample-bounded covariance + driver power iteration, then the one
      // projection pass writing the 16-d reduced layout; the serving
      // entry times the coarse-scan + re-rank, not the build
      (s, d) => { queries.ApproxQueries.pcaLayout(s, d); () }),
    ("build_lm_model", Set("tx_perplexity", "pipe_perplexity_gate"),
      // one bounded bigram-bucket aggregate over the reference slice +
      // driver log-smoothing; the serving entries time SCORING under the
      // quantized weights, not the fit
      (s, d) => { queries.TextQueries.lmModel(s, d); () }),
    ("build_langid_model", Set("tx_langid_model"),
      // one bounded fixture aggregate + driver log-smoothing; the serving
      // entry times integer-dot classification, not training
      (s, d) => { queries.TextQueries.langIdModel(s, d); () }),
    ("build_bpe_model", Set("tx_bpe_corpus_vocab", "tx_bpe_stats_trained"),
      // one wordcount shuffle + driver-side merge learning; the serving
      // entry times ENCODING under the learned model, not training
      (s, d) => { queries.TextQueries.bpeModel(s, d); () }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (load0, jvm0) = (loadAvg, javaProcs)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .pipe(graft.search.IdFetch.configure)
      // the janino class cache defaults to 100 entries — sized for an app
      // serving a few plans, not 200+ entries' stages compiled through ONE
      // JVM: evictions recompile already-seen fragments mid-suite, and
      // whichever entry's slot pays the recompile wanders round to round
      // (the vq_hnsw_stored_topk history — r15 3.27 s, r16 1.45, r17
      // 3.74/4.11 with a 0.8 s isolated floor). Static conf, so it must
      // land at builder time; 4096 covers the suite's ~2.8k generated
      // classes with headroom. Evidence rides in the artifact's
      // env.codegen_compiles.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-only filter: SPARK_GRAFT_ONLY=q1,q2 restricts to named queries
    // (and prints their formatted plans — to stderr, so stdout stays a
    // parseable single JSON line) for single-query profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        Console.err.println(
          s"WARN: SPARK_GRAFT_ONLY names match no registered query: ${unknown.mkString(", ")}")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    var failed = List.empty[String]
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      var ok = true
      try body catch {
        case e: Throwable =>
          ok = false
          failed ::= name
          Console.err.println(s"FAIL $name: $e")
          e.printStackTrace(Console.err)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // one progress line per completed entry, to stderr: the final summary
      // line on stdout is a single long JSON whose tail captures have
      // repeatedly truncated — these lines make any partial capture
      // reconstructable entry-by-entry without parsing the summary
      Console.err.println(s"""BENCH_ENTRY {"name":"$name","sec":$sec,"ok":$ok}""")
      name -> sec
    }
    val builds = buildSteps
      .filter { case (_, deps, _) => deps.exists(selected.contains) }
      .map { case (name, _, build) => timed(name)(build(spark, sfDir)) }
    val runs = selected.toSeq.map { case (name, fn) =>
      if (only.isDefined)
        Console.withOut(Console.err) { fn(spark, sfDir).explain("formatted") }
      timed(name)(fn(spark, sfDir).count())
    }
    val results = builds ++ runs
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // janino activity evidence: with the whole suite in ONE JVM, codegen
    // class-cache evictions show up as recompilations of already-seen
    // plans — the artifact carries the count/time so a cache-thrash run
    // is self-identifying (the vq_hnsw_stored_topk slot history)
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    val env = s"""{"cpus":$cpus,"host_cores":${Runtime.getRuntime.availableProcessors},""" +
      s""""load_avg_start":$load0,"load_avg_end":$loadAvg,""" +
      s""""java_procs_start":$jvm0,"java_procs_end":$javaProcs,""" +
      s""""codegen_compiles":${cg.METRIC_COMPILATION_TIME.getCount},""" +
      s""""codegen_compile_mean_ms":${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean.round}}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":${failed.size},"failed":$failedJson,"env":$env,"sf":"$sfDir"}"""
    println(line)
    // The stdout line is the driver contract, but its capture window has
    // repeatedly truncated (a 2000-char tail holds ~59 of 88 entries) —
    // also write the complete summary beside the repo artifacts so every
    // entry survives regardless of how stdout was captured. Env override
    // for dev runs that shouldn't touch the repo copy.
    val selfPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SELF", "BENCH_SELF.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(selfPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => Console.err.println(s"WARN: BENCH_SELF write failed: $e") }
    spark.stop()
  }
}
