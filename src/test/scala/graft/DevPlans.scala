package graft

import scala.util.chaining._

import org.apache.spark.sql.SparkSession

/** Dev tool: regenerates PLANS.md — formatted physical plans of
  * representative queries with a one-line "what to look for" note each.
  * Run: `sbt "runMain graft.DevPlans"` (writes /root/repo/PLANS.md). */
object DevPlans {

  /** (query name, the plan property the dump evidences). */
  private val Selected: Seq[(String, String)] = Seq(
    "vq_brute_topk" -> "exact top-k: TakeOrderedAndProject directly over the scan, no shuffle, codegen'd cosine",
    "vq_filtered_topk" -> "filter-first: predicate pushed into the parquet scan before ranking",
    "vq_batch_topk" -> "batch search: broadcast queries + k-bounded ObjectHashAggregate (partial_topk map-side)",
    "vq_get_by_id" -> "point lookup over the sorted layout: id equality pushed to the scan, row-group stats prune",
    "vq_ivf_batch_topk" -> "IVF batch: probe-cluster equi-join against the cluster-partitioned layout (partition pruning)",
    "q3_join_topk" -> "broadcast of the filtered customer dimension; single shuffle for the aggregate",
    "q_join_types" -> "semi/anti/outer-null in ONE job: left-outer against distinct keys, one aggregate, explode pivot",
    "ev_asof_orders" -> "as-of join: single shuffle, sort-merge on (key, time), last-value window",
    "dd_minhash_lsh" -> "banded LSH: equi-join on (band, hash) — no cross join anywhere",
    "dd_ngram_capped" -> "serves the persisted pair layout (candidates built once in build_pair_layout: banded MinHash + exact array_intersect verify)",
    "dd_simhash" -> "pigeonhole bit-band equi-join (13 bands / 60 bits): NO BroadcastNestedLoopJoin",
    "ann_pq_adc_topk" -> "ADC scan over m-byte codes instead of full vectors",
    "ev_range_join" -> "banded range join: equi-join on time buckets, then exact range filter",
    "ann_ivfpq_topk" -> "IVF-PQ serving: ADC over m-byte codes from probed cluster partitions only, then the PRUNED exact refine — the bounded ADC cut's ids land as a pushed In(vec_id, …) filter over the id-clustered layout",
    "tx_bm25_topk" -> "BM25 one-scan: cached per-doc scalar projection (dl + per-term tf, no token explode), stats inlined as literals, TakeOrderedAndProject on the rounded score",
    "pipe_curated_mix" -> "curation pipeline over the persisted COMPONENT layout: keepers are one filtered scan of the materialized assignment (no contraction at serve time) + one semi-join, pure-expression quality/sampling filters",
    "tx_vocab_topk" -> "vocab wordcount: map-side partial aggregation, one token-key shuffle, bounded TakeOrderedAndProject",
    "dd_repeated_ngrams" -> "repeated-span audit: exploded grams, two-level countDistinct aggregate, bounded top-N",
    "tx_chunk_bm25" -> "chunk-granularity BM25: chunk explode feeding the one-scan cached projection, no extra corpus pass",
    "tx_cjk_bm25" -> "CJK bigram normalization: pure expression stage (split/transform/substr/flatten) feeding the same one-scan BM25 — codegen'd, no UDF, no extra pass",
    "tx_embed" -> "hash-projection embedding: one md5 per token then ONE hash_embed kernel pass accumulating all dims (O(tokens+dim)/row), inside whole-stage codegen — the value-gated embed stage",
    "dd_embedding_ivf" -> "serves the persisted IVF-bucketed pair layout (pairs discovered once in build_emb_pair_layout: codegen'd probe-list explode, shuffle-hash equi-join on cluster_id, exact cosine threshold in place — NLJ-free, DedupSpec plan-asserts the building pipeline)",
    "pipe_rag_e2e" -> "RAG serving leg: probe-pruned scan over the registry-cached embedded chunks (InMemoryTableScan), TakeOrderedAndProject on the rounded cosine",
    "vq_hnsw_routed_topk" -> "centroid-routed stored-HNSW, ADAPTIVE probing: the radius-margin probe list lands as PartitionFilters over the shard layout — only the per-query probed shard files scan, graphs restore in place (no index exchange)",
    "vq_ivf_stored_topk" -> "stored-IVF serving default: ADAPTIVE candidate-mass probe list (3 partitions here vs parity 8) still arriving as the cluster_id partition filter — pruning shape unchanged, budget adaptive",
    "ann_lsh_topk" -> "stored multi-table LSH, adaptive probe budget: group conjunct in PartitionFilters over (lsh_table, lsh_bgroup) dirs, exact-bucket conjunct in PushedFilters (row-group pruning); every candidate fetches the single payload copy via one DPP-pruned left-semi broadcast join against table-0",
    "ann_lsh_batch_topk" -> "batch LSH: ONE scan pruned by the union of every query's probed dirs (PartitionFilters), per-query admission by broadcast equi-join, k-bounded per-query aggregator",
    "ann_sq_topk" -> "SQ8 stored-codes serving: the scan reads (vec_id, 64-byte sq_code) only — ReadSchema has no vector column — one codegen'd sq_score projection, TakeOrderedAndProject",
    "vq_range_topk" -> "range search: threshold predicate on the FUSED cosine_sim kernel (Catalyst copies the sim expression into the pushed-down filter — the expanded spelling landed twice and fell out of JIT; the kernel is one loop however often it is duplicated), sort only over survivors",
    "vq_grouped_topk" -> "grouped top-k: k-bounded ObjectHashAggregate keyed by category (partial_topk map-side — <= k rows per group per task on the shuffle)",
    "ann_bin_topk" -> "binary stored-codes serving: the stage-1 scan reads (vec_id, two packed BIGINT words) only — popcount-XOR Hamming in codegen, TakeOrderedAndProject cut — then the collected candidate ids land as a pushed In(vec_id, …) filter over the id-clustered vector layout (PRUNED fetch, not a full-table join probe)",
    "ann_maxsim_topk" -> "late interaction: chunk explode + hash_embed + one fused cosine per facet in a single codegen stage, ONE map-side-combined max aggregate keyed by doc (no join — query vectors ride as literals), TakeOrderedAndProject on the left-associated facet sum",
    "tx_pii" -> "PII scrub: the regexp count/redact chain is pure per-row expressions inside whole-stage codegen — no shuffle before the report sort",
    "pipe_pack" -> "packing offsets: two-level distributed prefix sum — S-row totals aggregate, broadcast shard bases, per-shard window exchange (hashpartitioning(shard)) — no single-partition global sort anywhere",
    "ev_funnel" -> "conversion funnel: three nested per-user window minima over ONE user_id exchange (each stage's predicate references the previous stage's column) — no self-joins, no per-stage scans",
    "q_zorder_box" -> "z-ordered layout serving: both box conjuncts in PushedFilters over the Morton-clustered files — footer min/max stats prune 27 of 32 files (measured) with no index structure",
    "ev_props_json" -> "semi-structured extraction: get_json_object path expression in the scan projection (no struct materialization), Par-widened past the single-split scan, one partial-aggregated shuffle",
    "dd_fuzzy_parts" -> "edit-distance fuzzy match: (brand, length-band) blocked SHUFFLED merge self-join (lossless banding: lev<=3 implies |len diff|<=3; no build-side broadcast, survives 100TB), native levenshtein in codegen — |block|^2 bounded per (brand,band), widened on the blocking keys",
    "vq_ivf_bigbatch" -> "DataFrame-native big-batch IVF: queries NEVER collected — codegen'd probe_clusters explode, then a SHUFFLED hash join on (cluster_id, salt) with the data side salted (k*S join granules past the 16-value key bottleneck); no BroadcastExchange of anything query-sized",
    "vq_hnsw_routed_bigbatch" -> "DataFrame-native big-batch routed HNSW: probe-shard explode over the routing centroids, then ONE cogroup (two grouping exchanges) pairing each shard's graph rows with exactly its queries — graph restored once per shard, nothing on the driver",
    "ann_lsh_bigbatch" -> "DataFrame-native big-batch LSH: per-table bucket expressions on the query DataFrame, admission/pointer-dedup/payload-fetch/score all as SHUFFLED equi-joins — the collected path's broadcasts replaced end-to-end",
    "ann_bin_batch_topk" -> "batch binary serving: ONE Hamming scan evaluates every query's popcount-XOR sum in the same projection (struct-array explode), per-query k-bounded aggregator cut, pruned In-list candidate fetch over the id-clustered layout",
    "ann_ivfpq_bigbatch" -> "DataFrame-native big-batch IVF-PQ: adaptive probe explode over the code layout, salted shuffled cluster join, LUT-FREE direct-ADC kernel in the scoring projection (bit-identical to the collected LUT path), shuffle-join exact refine — no per-query driver state anywhere",
    "tx_cjk_bm25_dict" -> "dictionary CJK segmentation: the FMM fold is ONE aggregate() expression per token (struct accumulator) inside the corpus projection — no UDF, no extra pass; the segmented fixture broadcast-joins documents like the bigram twin",
    "dd_span_scrub" -> "span-scrub apply step: dup-gram set via two-level gram aggregate, doc grams re-join it SHUFFLE-HASH on the widened gram key (never broadcast — the dup set grows with the corpus), bounded k-row interval expansion, one (doc,pos) distinct + per-doc count",
    "pipe_shuffle_shards" -> "deterministic training shuffle: md5 shard + position keys as pure expressions on the scan, ONE hash exchange on shard, per-shard sort for row_number — no global sort, no rand(), replayable",
    "pipe_temperature_mix" -> "temperature mixing: per-source mass aggregate (rows = #sources, bounded) broadcast back onto the scan, acceptance is a pure md5-bucket expression filter — the corpus is shuffled once for the final per-source report only",
    "ev_retention" -> "cohort retention: cohort day is a min-over-user WINDOW — ONE corpus exchange on user_id, NO cohort join (nothing user-sized to broadcast), then one bounded (cohort, offset) countDistinct aggregate",
    "dd_incremental_lsh" -> "incremental dedup: delta signatures computed fresh (only the delta pays minhash), corpus side is a persisted-layout SCAN, shuffle-hash band join with the bounded DELTA as the build side — no corpus recompute, no self-join",
    "tx_bigram_rarity" -> "rare-bigram perplexity proxy: ONE cached exploded bigram pass (InMemoryTableScan on both branches — column pruning would otherwise fork two full scan+shuffle subtrees) feeds the count aggregate and the shuffle-hash re-join; per-doc aggregate joins back shuffle-hash too — nothing corpus-growing is broadcast",
    "dd_span_scrub_text" -> "scrubbed-text apply: the shared covered-positions stage (shuffle-hash dup-gram join, never broadcast) anti-joins the token stream, per-doc rebuild is ONE sorted-struct aggregate — no window, order restored by array_sort on the position field",
    "pipe_pack_bpe" -> "tokenizer-unit packing: the BPE count is one more scan-side expression feeding the SAME two-level prefix-sum shape as pipe_pack — per-shard windows + broadcast shard bases, no single-partition global sort",
    "tx_bpe_stats_trained" -> "corpus-trained BPE encode: identical plan shape to the fixture entry — the broadcast merge-table kernel (bpe_encode) runs scan-side with NO training work in the serve (the trained model is memoized build state); plan size O(1) in merge count",
    "vq_ivf_bigbatch_filtered" -> "FILTERED big-batch IVF: the S5 predicate lands on the layout scan (PushedFilters) BEFORE scoring; probe assignment is the codegen probe_clusters kernel per query row; shuffled salted equi-join on (cluster_id, salt), k-bounded partial_topk aggregate — nothing query-sized broadcast",
    "dd_span_maximal" -> "maximal span intervals: the SAME exploded-gram shuffle as the coverage family (dup-gram set re-joined SHUFFLE-HASH, never broadcast); the interval merge is a per-doc sorted-array fold inside ONE keyed aggregate — no window, no global sort",
    "dd_image_phash" -> "image perceptual hash: fixture synthesis + raster decode + dHash all scan-side codegen kernels (media_fixture → media_dhash) — one projection, no shuffle before the final order",
    "tx_quality_model" -> "learned quality gate: token explode + BOUNDED 256-row weight BroadcastHashJoin + ONE map-side-combinable integer sum per doc — model state is fixed-size, nothing corpus-growing is broadcast, the logit is three scalar ops in the final projection",
    "pipe_pack_ffd" -> "doc-boundary FFD packing: ONE hash exchange on the shard group key, per-shard sort + LINEAR imperative fold (MapGroups — genuine sequential per-group state), no global sort, no second corpus pass",
    "pipe_epoch_mix" -> "epoch/repetition mixing: the same bounded per-source mass broadcast as the temperature mix, repetition count is a pure integer-ceil expression off the shared md5 bucket — one shuffle for the per-source report only",
    "vq_merge_agg" -> "keyed bulk MERGE: ONE left-anti join on the id (bounded delta → AQE broadcasts the key side) + union of the delta's upsert rows — present ids update, absent insert, D-rows remove; no per-row driver work",
    "ann_opq_adc_topk" -> "OPQ-P serving: identical shape to ann_pq_adc_topk — the scan reads m-byte codes from the PERMUTED layout, the query permutes driver-side (exact reorder, zero arithmetic), one codegen ADC projection, TakeOrderedAndProject",
    "q_hll_users" -> "deterministic HLL: md5 hash + integer-CASE rho as scan-side expressions, register table = types x 16 rows via one map-side-combined aggregate, dyadic-exact register sum — a sketch with no libm anywhere",
    "pipe_quality_mix" -> "quality-gated mix: ONE cached gate-scoring pass (InMemoryTableScan feeds both branches), survivors' bounded per-source mass broadcast, md5-bucket acceptance as pure expressions — the composed curation stage in two shuffles",
    "pipe_dsir_sample" -> "DSIR resampling: token explode + BOUNDED 256-row weight BroadcastHashJoin + one map-side-combinable integer sum per doc (the quality-gate shape), then a 257-row threshold BroadcastHashJoin and a pure md5-compare accept — model state fixed-size, one doc-keyed shuffle",
    "q_heavy_hitters" -> "Count-Min heavy hitters: explode-by-depth with map-side partial aggregation down to the 192-row counter table, per-key exact counts one hash aggregate, estimates via three BOUNDED counter BroadcastHashJoins, TakeOrderedAndProject cut — nothing corpus-sized moves",
    "q_quantile_sketch" -> "quantile sketch: the BottomS ObjectHashAggregate truncates to s rows per (group, partition) map-side — the shuffle carries <= s rows per group per task, no per-group window sort anywhere",
    "dd_audio_fp" -> "audio fingerprint: fixture synthesis + PCM decode + 65-window energy dHash all scan-side codegen kernels (media_fixture -> media_audio_fp) — one projection, no shuffle before the final order",
    "ann_ivf_topk" -> "adaptive-default embeddings IVF: the candidate-mass probe walk runs driver-side over the 16-centroid model + size map; the plan is the same pruned cluster_id filter scan as the fixed rule — budget adaptive, pruning shape unchanged",
    "pipe_dsir_mix" -> "full curation capstone: ONE cached gate-scoring pass (InMemoryTableScan feeds gate + survivor branches), DSIR's bounded 256/257-row broadcast joins over the gated survivors, bounded per-source mass broadcast, pure-expression md5 acceptance — three shuffles end to end",
    "pipe_domain_mix" -> "learned-domain mixing: embed+assign are scan-side codegen kernels (hash_embed → nearest_centroid, 8×16-double model state riding the plan), bounded per-domain mass broadcast, pure-expression acceptance — no corpus-sized join anywhere",
    "pipe_decontaminate_fuzzy" -> "fuzzy decontamination: eval docs (the bounded DELTA) pay fresh minhash, corpus side is a SCAN of the persisted signature layout with eval ids anti-joined out, shuffle-hash band join with the eval side as build — delta×corpus, never corpus²",
    "tx_langid_model" -> "learned language ID: bounded-prefix trigram explode, BOUNDED |langs|·256-row weight BroadcastHashJoin, per-(doc,lang) integer dots map-side combined, argmax window over ≤|langs| rows per doc — model state fixed-size",
    "dd_video_phash" -> "video near-dup: Y4M decode + per-frame dHash as ONE scan-side codegen kernel (media_video_fp), slot-0 pigeonhole band join (complete: all-aligned-≤ implies slot-0-≤), exact aligned-slot max verify in place",
    "vq_asof_read" -> "time-travel read: the PINNED version directory resolves once, then the plan is a plain pruned scan of that immutable snapshot — version semantics are directory selection, zero plan overhead",
    "q_kmv_sets" -> "KMV set sketch, estimator-only serving: one distinct aggregate over (type, hash) — the only corpus shuffle, map-side combinable — then the BottomS truncation bounds everything downstream at types·k rows; the exact-comparison audit lives in the spec-gated kmvSets twin",
    "tx_perplexity" -> "LM perplexity scoring: bigram explode + BOUNDED pair-weight and context-default BroadcastHashJoins + one map-side-combinable integer sum per doc — the quality-gate shape with a two-level (pair, fallback) lookup",
    "pipe_perplexity_gate" -> "relative perplexity gate: ONE cached scoring pass (InMemoryTableScan feeds threshold + acceptance branches), the pooled threshold is a SCALAR broadcast, keep-compare is integer expressions — no sort, no percentile pass",
    "pipe_stratified_sample" -> "stratified sampling: the BottomS ObjectHashAggregate truncates to s rows per (stratum, partition) map-side — the shuffle carries ≤ s per stratum per task; stratum populations broadcast onto the bounded sample",
    "ann_pca_topk" -> "PCA two-stage: the coarse scan's ReadSchema is (vec_id, p0..p15) — a quarter of the float bytes, no vector column — one codegen'd subspace-L2 projection, TakeOrderedAndProject cut; the re-rank is a PRUNED fetch — PushedFilters shows In(vec_id, [400 ids]) over the id-clustered layout, row groups read ∝ candidate count",
    "ann_pca_batch_topk" -> "batch PCA serving: ONE reduced-layout scan evaluates every query's subspace distance in the same projection (struct-array explode), per-query k-bounded aggregator cuts; the re-rank fetches the candidate union via the pushed In(vec_id, …) filter with each query's vector attached from the rebuilt local frame",
    "pipe_diverse_sample" -> "learned-domain diversity sampling: embed+assign are scan-side codegen kernels (model state rides the plan), the BottomS ObjectHashAggregate truncates to s rows per (domain, partition) map-side, domain populations broadcast onto the bounded sample",
    "tx_html_text" -> "HTML extraction: page construction + the whole removal/strip/decode/normalize regex chain are ONE scan-side codegen projection — no UDF, no shuffle before the final order; at 100 TB this runs at scan speed beside the WARC reader",
    "tx_url_stats" -> "URL canonicalization: scheme/host/port/path/query extracts and the tracking-param array filter are pure scan-side expressions; ONE host-keyed aggregate shuffle (map-side combined) for the per-host fetch-vs-page stats",
    "dd_url_dedup" -> "canonical-URL dedup: the canonicalization chain in the scan projection, ONE group-by shuffle on the canonical key with map-side partial aggregation — the crawl's cheapest dedup pass, no content bytes touched",
    "dd_quality_keepers" -> "quality-aware keepers: the component assignment is a SCAN of the persisted component layout (the star-contraction is build-time state), ONE aggregate per component over a (quality, -id) struct max — no window, map-side combinable; the quality expression rides the scan projection",
    "dd_components" -> "near-dup components served from the persisted component layout: one parquet scan + the presentation sort — the iterative contraction loop runs only in build_component_layout",
    "pipe_export_shards" -> "token-shard round-trip: per-file binary decode aggregates (the serve side); the export itself is build state — one token-stream shuffle keyed by window id, bounded per-window assembly, task-parallel shard files",
    "dd_components_incremental" -> "the maintenance path's serve: one scan of the incrementally-grown component layout — prior fixed point + delta re-propagation ran at build time, hash-gated against the same oracle as dd_components",
    "pipe_corpus_shards_trained" -> "corpus-TRAINED capstone serve: the round-trip decode of the trained-vocab shard bytes (binaryFiles aggregate) — training, trained encode, vocab ranking and the shard write all ran in build_corpus_shards_trained",
    "pipe_audit" -> "lineage audit: one scan of the persisted component layout + the bounded contaminated set as left joins, quality/sampling as pure expressions, verdict a CASE projection — the capstone's joins minus the chunk explode",
    "dd_dup_mass" -> "duplicate-mass accounting: documents joined narrow to the persisted (doc_id, component) layout, one map-side-combined aggregate keyed by source (rows = |sources|)")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .pipe(graft.search.IdFetch.configure)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append(s"Generated by `graft.DevPlans` at sf0.01 (plans are scale-independent in shape).\n")
    Selected.foreach { case (name, note) =>
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan\n```\n")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote PLANS.md with ${Selected.size} plans")
    spark.stop()
  }
}
