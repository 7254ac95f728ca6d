package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MllibLsh}
import graft.model.VectorModel

/** Deduplication queries over `documents`/`embeddings` with DuckDB mirrors.
  * All five dedup families (exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding cosine) are deterministic, so each gets a full value-level
  * oracle — including the LSH ones, thanks to md5-derived hashing. */
object DedupQueries {

  private val NumHashes = 32
  private val Bands = 8
  private val ShingleK = 3

  /** Shared DuckDB CTE: distinct 3-word shingles per doc. */
  private val shingleCte =
    s"""sgl AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [toks[i]||' '||toks[i+1]||' '||toks[i+2] for i in range(1, len(toks)-1)])) AS sg
       |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
       |  WHERE len(toks) >= $ShingleK)""".stripMargin

  /** Exact dedup: one row per distinct content. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(VectorModel.documents(spark, dir), "doc_id", "text")
      .orderBy("keeper")

  val exactSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin

  /** N-gram Jaccard near-dup pairs (threshold 0.5). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(VectorModel.documents(spark, dir), "doc_id", "text",
      ShingleK, 0.5)
      .orderBy("da", "db")

  val ngramJaccardSql: String =
    s"""WITH $shingleCte,
       |pairs AS (
       |  SELECT a.doc_id da, b.doc_id db, count(*) inter
       |  FROM sgl a JOIN sgl b ON a.sg = b.sg AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, count(*) n FROM sgl GROUP BY doc_id)
       |SELECT da, db, round(CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
       |FROM pairs JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE) >= CAST('0.5' AS DOUBLE)
       |ORDER BY da, db""".stripMargin

  /** Build-once/serve-many MinHash signature layout: the per-doc h0..h31
    * aggregation is the shared base of BOTH banded-candidate consumers —
    * the exact-verified pair layout ([[pairLayout]], 32 single-row bands)
    * and the estimate-serving `dd_minhash_lsh` (8 four-row bands) — so it
    * runs once per dataset dir and persists, exactly like the index
    * layouts. Exposed so Bench times it as `build_sig_layout`. */
  private[graft] def sigLayout(spark: SparkSession, dir: String): String =
    sigLayoutCache.computeIfAbsent(dir, _ => {
      val p = graft.store.Fs.scratchDir(spark, "graft_sig_layout") + "/sig"
      Dedup.minhashSignatures(VectorModel.documents(spark, dir),
        "doc_id", "text", NumHashes, ShingleK)
        .write.mode("overwrite").parquet(p)
      p
    })

  private val sigLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-once/serve-many banded-pair layout: the band-join + exact-verify
    * pipeline over the persisted signatures
    * ([[Dedup.ngramJaccardPairsBandedFromSig]]) is the shared candidate
    * stage of THREE registered queries (`dd_ngram_capped`,
    * `dd_components`, `pipe_curated_mix`); it runs once per dataset dir
    * and persists its exact pair list, and all three serve from the
    * layout — the same build/serve split the index layouts use
    * ([[ApproxQueries.ivfLayout]]). Exposed so Bench times it as an
    * explicit `build_pair_layout` pre-step. */
  private[graft] def pairLayout(spark: SparkSession, dir: String): String =
    pairLayoutCache.computeIfAbsent(dir, _ => {
      val p = graft.store.Fs.scratchDir(spark, "graft_pair_layout") + "/pairs"
      Dedup.ngramJaccardPairsBandedFromSig(VectorModel.documents(spark, dir),
        spark.read.parquet(sigLayout(spark, dir)),
        "doc_id", "text", ShingleK, 0.5, numHashes = NumHashes)
        .write.mode("overwrite").parquet(p)
      p
    })

  private val pairLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Banded n-gram Jaccard — the web-scale variant (candidates from 32
    * single-row MinHash bands, TRUE Jaccard recomputed on candidates with
    * array_intersect), served from the persisted pair layout. A qualifying
    * pair (j ≥ 0.5) is missed only if it disagrees on all 32 minhashes —
    * probability ≤ 2⁻³², corpus-independent — so its output equals the
    * exact operator's on any real corpus; DedupSpec asserts that equality
    * in-process. Its DRIVER oracle, though, is its own semantics
    * ([[ngramJaccardCappedSql]] mirrors the banding), so the gate does not
    * depend on the corpus avoiding the 2⁻³² event. */
  def ngramJaccardCapped(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(pairLayout(spark, dir)).orderBy("da", "db")

  /** DuckDB mirror of the banded variant's exact semantics: the same 32
    * minhash functions over 60-bit md5 shingle hashes, candidates = pairs
    * agreeing on ANY single minhash (single-row bands ≡ raw h_j equality —
    * the Spark side's md5(band slice) key only re-encodes h_j), true
    * Jaccard recomputed over the DISTINCT hashed-shingle sets. */
  val ngramJaccardCappedSql: String = {
    val p = Dedup.MinhashP
    val mins = (0 until NumHashes)
      .map(j => s"min((${Dedup.minhashA(j)} * hm + ${Dedup.minhashB(j)}) % $p) AS h$j")
      .mkString(", ")
    s"""WITH $shingleCte,
       |hsh AS (SELECT DISTINCT doc_id, ('0x'||substr(md5(sg),1,15))::BIGINT AS hv FROM sgl),
       |sz AS (SELECT doc_id, count(*) n FROM hsh GROUP BY doc_id),
       |sig AS (SELECT doc_id, $mins FROM (SELECT doc_id, hv % $p AS hm FROM hsh) GROUP BY doc_id),
       |bl AS (SELECT doc_id, j, hv FROM sig
       |       UNPIVOT (hv FOR j IN (${(0 until NumHashes).map("h" + _).mkString(", ")}))),
       |cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
       |         FROM bl a JOIN bl b ON a.j = b.j AND a.hv = b.hv AND a.doc_id < b.doc_id),
       |inter AS (SELECT c.da, c.db, count(*) inter
       |          FROM cand c JOIN hsh a ON a.doc_id = c.da
       |                      JOIN hsh b ON b.doc_id = c.db AND a.hv = b.hv
       |          GROUP BY 1, 2)
       |SELECT da, db, round(CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
       |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE) >= CAST('0.5' AS DOUBLE)
       |ORDER BY da, db""".stripMargin
  }

  /** Build-once/serve-many COMPONENT layout: the component ASSIGNMENT is
    * a pure function of the persisted pair layout, and SIX serving paths
    * consume it (`dd_components`, `dd_quality_keepers`,
    * `pipe_curated_mix`, `pipe_split_leakproof`, the
    * `pipe_train_corpus*` capstones) — so the iterative star-contraction
    * ([[Dedup.connectedComponents]]) runs ONCE per dataset dir and every
    * serve is a scan of the materialized (doc_id, component) table, the
    * same build/serve split [[pairLayout]] gave the candidate stage one
    * level down. At 100 TB the layout is two longs per doc — a
    * column-pruned scan — while a per-serve re-contraction would re-pay
    * O(diameter) join cycles over a billion-edge pair set on every
    * keeper/split/capstone query. The FULL assignment (isolated docs
    * labeled self) is stored, not just touched vertices, so consumers
    * need no coalesce join back to the corpus. Exposed so Bench times it
    * as the explicit `build_component_layout` pre-step. Growth without a
    * full rebuild is [[Dedup.incrementalComponents]] — the delta
    * re-propagation ComponentSpec pins against fresh contraction. */
  private[graft] def componentLayout(spark: SparkSession, dir: String): String =
    componentLayoutCache.computeIfAbsent(dir, _ => {
      val p = graft.store.Fs.scratchDir(spark, "graft_component_layout") + "/components"
      val docs = VectorModel.documents(spark, dir)
      val pairs = spark.read.parquet(pairLayout(spark, dir))
      Dedup.connectedComponents(docs, "doc_id", pairs)
        .write.mode("overwrite").parquet(p)
      p
    })

  private val componentLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Near-dup connected components: every doc labeled with the min id of
    * its component in the banded-Jaccard pair graph — the keeper
    * assignment (keep doc where doc_id == component), served from the
    * persisted [[componentLayout]]. */
  def components(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(componentLayout(spark, dir)).orderBy("doc_id")

  /** The MAINTENANCE path under the driver's hash gate: the component
    * layout grown by delta re-propagation instead of a full rebuild. The
    * pair layout splits deterministically in half ("already crawled" vs
    * "the new batch"), the prior fixed point contracts from the old
    * half, the delta re-propagates through
    * [[Dedup.incrementalComponents]], and the merged full assignment
    * must HASH-MATCH the same recursive-CTE oracle `dd_components`
    * answers to — the incremental path is correct not just by spec
    * fixture but against the driver's independent engine on the real
    * corpus. Built once per dir (`build_incr_component_layout`); the
    * serve is a scan. */
  private[graft] def incrComponentLayout(spark: SparkSession, dir: String): String =
    incrComponentLayoutCache.computeIfAbsent(dir, _ => {
      val p = graft.store.Fs.scratchDir(spark, "graft_incr_component_layout") +
        "/components"
      val docs = VectorModel.documents(spark, dir)
      val pairs = spark.read.parquet(pairLayout(spark, dir))
      val isOld = Dedup.hash60(concat_ws(":", col("da"), col("db"))) % 2 === 0
      val prior = Dedup.connectedComponents(docs, "doc_id", pairs.where(isOld))
      val inc = Dedup.incrementalComponents(prior, "doc_id", pairs.where(!isOld))
      docs.select(col("doc_id"))
        .join(inc.withColumnRenamed("component", "c"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("c"), col("doc_id")).as("component"))
        .write.mode("overwrite").parquet(p)
      p
    })

  private val incrComponentLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def componentsIncremental(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(incrComponentLayout(spark, dir)).orderBy("doc_id")

  /** Recursive-CTE mirror: full reachability closure over the symmetrized
    * pair graph (tiny components make the closure cheap for the oracle),
    * component = min reachable id. The pair CTE is the banded oracle
    * nested verbatim, so the gate covers the whole composition. */
  /** The component CTE chain (pairs → edges → reach → comp(doc_id,
    * component)) — ONE definition composed by [[componentsSql]] and the
    * quality-keeper oracle, so the two cannot drift. */
  private lazy val componentCtes: String =
    s"""pairs AS ($ngramJaccardCappedSql),
       |edges AS (SELECT da AS src, db AS dst FROM pairs
       |          UNION ALL SELECT db AS src, da AS dst FROM pairs),
       |reach(doc, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src),
       |comp AS (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)""".stripMargin

  lazy val componentsSql: String =
    s"""WITH RECURSIVE $componentCtes
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin

  /** Duplicate-MASS accounting per source — the dedup dashboard number a
    * curation run reports ("dedup removed N% of the token mass"): docs
    * and token counts split keeper vs duplicate (doc ≠ its component
    * min) from the persisted component layout. One scan + one narrow
    * join + one bounded aggregate (rows = |sources|); the token counts
    * are the same whitespace measure the packing family uses. */
  def dupMass(spark: SparkSession, dir: String): DataFrame = {
    val docs = VectorModel.documents(spark, dir)
    val comp = spark.read.parquet(componentLayout(spark, dir))
    docs.join(comp, Seq("doc_id"))
      .select(col("source"),
        (col("doc_id") =!= col("component")).as("dup"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_total"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("docs_dup"),
        sum(col("nt")).as("tokens_total"),
        sum(when(col("dup"), col("nt")).otherwise(0L)).as("tokens_dup"))
      .withColumn("dup_token_frac",
        round(col("tokens_dup").cast("double") / col("tokens_total"), 6))
      .orderBy("source")
  }

  lazy val dupMassSql: String =
    s"""WITH RECURSIVE $componentCtes,
       |d AS (SELECT source,
       |    (documents.doc_id <> comp.component) AS dup,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents JOIN comp ON documents.doc_id = comp.doc_id)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS docs_total,
       |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS docs_dup,
       |  CAST(sum(nt) AS BIGINT) AS tokens_total,
       |  CAST(sum(CASE WHEN dup THEN nt ELSE 0 END) AS BIGINT) AS tokens_dup,
       |  round(CAST(sum(CASE WHEN dup THEN nt ELSE 0 END) AS DOUBLE)
       |    / sum(nt), 6) AS dup_token_frac
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Quality-aware component keepers — the SemDeDup-grade refinement of
    * the min-id convention: within each near-dup component keep the
    * HIGHEST-quality member (ties to the lowest id), not the accidental
    * smallest id. A rewrite farm or boilerplate mirror usually contains
    * one clean original among noisier copies; min-id keeps whichever
    * arrived first, this keeps the best. One aggregate per component
    * (max over a (quality, −id) struct — no window, map-side
    * combinable), components bounded by the near-dup graph. */
  def qualityKeepers(spark: SparkSession, dir: String): DataFrame = {
    val docs = VectorModel.documents(spark, dir)
    val scored = spark.read.parquet(componentLayout(spark, dir))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("q",
        round(graft.text.TextAnalysis.qualityScore(col("text")), 6))
    scored.groupBy("component")
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("component"), (-col("m.nid")).cast("long").as("keeper"),
        col("m.q").as("keeper_q"), col("n_members"))
      .orderBy("component")
  }

  lazy val qualityKeepersSql: String = {
    val q = graft.queries.PipelineQueries.duckQualitySql
    s"""WITH RECURSIVE $componentCtes,
       |qk AS (SELECT c.component AS component, d.doc_id AS doc_id,
       |    round($q, 6) AS q
       |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
       |ranked AS (SELECT component, doc_id, q,
       |    row_number() OVER (PARTITION BY component
       |      ORDER BY q DESC, doc_id ASC) AS rn
       |  FROM qk),
       |n AS (SELECT component, count(*) AS n_members FROM qk GROUP BY component)
       |SELECT r.component, r.doc_id AS keeper, r.q AS keeper_q, n.n_members
       |FROM ranked r JOIN n USING (component) WHERE rn = 1
       |ORDER BY component""".stripMargin
  }

  /** Cross-doc repeated 8-gram spans (memorization / span-dedup audit):
    * grams shared by ≥ 2 documents, most-shared first
    * ([[Dedup.repeatedNgrams]]). */
  val RepeatK = 8
  val RepeatTopN = 100

  def repeatedNgrams(spark: SparkSession, dir: String): DataFrame =
    Dedup.repeatedNgrams(VectorModel.documents(spark, dir), "doc_id", "text",
      RepeatK, minDocs = 2, topN = RepeatTopN)

  val repeatedNgramsSql: String =
    s"""SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_total
       |FROM (SELECT doc_id, unnest(
       |        [array_to_string(toks[i:i+${RepeatK - 1}], ' ') for i in range(1, len(toks)-${RepeatK - 2})]) AS gram
       |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |      WHERE len(toks) >= $RepeatK)
       |GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, n_total DESC, gram ASC LIMIT $RepeatTopN""".stripMargin

  /** Per-doc duplicated-span coverage — the apply step of exact substring
    * dedup ([[Dedup.spanCoverage]]): fraction of each doc's token positions
    * covered by a cross-doc repeated 8-gram. */
  def spanScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanCoverage(VectorModel.documents(spark, dir), "doc_id", "text",
      RepeatK, minDocs = 2)
      .withColumnRenamed("doc", "doc_id")
      .orderBy("doc_id")

  /** Tokenize → positioned k-grams → cross-doc dup-gram set → duplicated
    * window starts: the CTE chain every span-family oracle opens with
    * (ONE parameterized definition so the report, apply, and maximal
    * mirrors cannot drift). */
  private def spanGramCtes(k: Int): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |gi AS (SELECT doc_id, toks,
       |         unnest(generate_series(1, len(toks) - ${k - 1})) AS i
       |       FROM t WHERE len(toks) >= $k),
       |g AS (SELECT doc_id, i - 1 AS p,
       |        array_to_string(toks[i:i+${k - 1}], ' ') AS gram FROM gi),
       |dup AS (SELECT gram FROM g GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2)""".stripMargin

  /** Shared CTE prefix of the span-scrub oracles: [[spanGramCtes]] at
    * [[RepeatK]] plus the raw covered positions. */
  private val spanCovCtes: String =
    s"""${spanGramCtes(RepeatK)},
       |covraw AS (SELECT g.doc_id,
       |             unnest(generate_series(g.p, g.p + ${RepeatK - 1})) AS pos
       |           FROM g JOIN dup USING (gram))""".stripMargin

  val spanScrubSql: String =
    s"""WITH $spanCovCtes,
       |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
       |cov AS (SELECT doc_id, count(DISTINCT pos) AS dup_tokens
       |        FROM covraw GROUP BY doc_id)
       |SELECT n.doc_id, n.n_tokens,
       |  CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  round(CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE) / CAST(n.n_tokens AS DOUBLE), 6) AS dup_frac
       |FROM n LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The scrubbed-TEXT apply step ([[Dedup.spanScrubbedText]]). */
  def spanScrubText(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanScrubbedText(VectorModel.documents(spark, dir), "doc_id", "text",
      RepeatK, minDocs = 2)
      .withColumnRenamed("doc", "doc_id")
      .orderBy("doc_id")

  val spanScrubTextSql: String =
    s"""WITH $spanCovCtes,
       |cov AS (SELECT DISTINCT doc_id, pos FROM covraw),
       |tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
       |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)),
       |kept AS (SELECT * FROM tok WHERE NOT EXISTS (
       |           SELECT 1 FROM cov c WHERE c.doc_id = tok.doc_id AND c.pos = tok.pos)),
       |sel AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS scrubbed,
       |          count(*) AS kept_tokens
       |        FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(sel.scrubbed, '') AS scrubbed,
       |  CAST(COALESCE(sel.kept_tokens, 0) AS BIGINT) AS kept_tokens
       |FROM documents d LEFT JOIN sel USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Minimum match length of the maximal-interval report — the published
    * exact-substring-dedup shape uses ≥50 BPE tokens on web corpora; 16
    * whitespace tokens is the same bar scaled to this corpus's doc
    * lengths (and double the 8-gram coverage primitive's granularity). */
  val MaxSpanL = 16

  /** Maximal duplicated-span intervals at minimum match length
    * [[MaxSpanL]] ([[Dedup.spanMaximalIntervals]]) — the suffix-array-
    * grade exact-substring report over the coverage family's gram
    * stream. */
  def spanMaximal(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanMaximalIntervals(VectorModel.documents(spark, dir), "doc_id",
      "text", MaxSpanL, minDocs = 2)
      .withColumnRenamed("doc", "doc_id")
      .orderBy("doc_id", "start")

  /** Interval mirror of [[spanMaximal]]: duplicated window starts via the
    * same gram CTE shape as [[spanScrubSql]] (at L = [[MaxSpanL]]), then
    * classic gaps-and-islands — a new island opens when the next start is
    * > L after the previous one (greater-than-L gap = the fixed-length
    * windows neither overlap nor touch), equivalently the engine's
    * chain.e ≥ p rule. */
  val spanMaximalSql: String =
    s"""WITH ${spanGramCtes(MaxSpanL)},
       |wins AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (gram)),
       |brk AS (SELECT doc_id, p,
       |          CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= $MaxSpanL
       |               THEN 0 ELSE 1 END AS b
       |        FROM wins),
       |isl AS (SELECT doc_id, p,
       |          sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM brk)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS start,
       |  CAST(max(p) + $MaxSpanL - min(p) AS BIGINT) AS len
       |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start""".stripMargin

  /** MinHash+LSH candidate pairs with estimated Jaccard ≥ 0.5, served
    * from the persisted signature layout — the band join + in-place
    * estimate only; the signature aggregation is the shared
    * `build_sig_layout` step. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshCandidatePairs(spark.read.parquet(sigLayout(spark, dir)),
      NumHashes, Bands, 0.5).orderBy("da", "db")

  /** Shared oracle builders for the MinHash signature family — ONE
    * definition of the hash60 mirror, the per-hash min expressions, the
    * band encodings, and the signature-match count, so the two consumers
    * ([[minhashLshSql]], [[incrementalLshSql]]) cannot drift. */
  private def sigMins: String = {
    val p = Dedup.MinhashP
    (0 until NumHashes)
      .map(j => s"min((${Dedup.minhashA(j)} * hm + ${Dedup.minhashB(j)}) % $p) AS h$j")
      .mkString(", ")
  }

  private def sigBandCols: String = {
    val rpb = NumHashes / Bands
    (0 until Bands).map { b =>
      "md5(" + (0 until rpb).map(r => s"CAST(h${b * rpb + r} AS VARCHAR)")
        .mkString("||','||") + s") AS band$b"
    }.mkString(", ")
  }

  private def sigMatches: String =
    (0 until NumHashes)
      .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)").mkString(" + ")

  /** CTE chain text→shingles→hash→signatures→band-exploded rows; the WITH
    * prefix both signature-family oracles open with. */
  private def sigBandCtePrefix: String =
    s"""$shingleCte,
       |hm AS (SELECT doc_id, ('0x'||substr(md5(sg),1,15))::BIGINT % ${Dedup.MinhashP} AS hm FROM sgl),
       |sig AS (SELECT doc_id, $sigMins FROM hm GROUP BY doc_id),
       |bands AS (SELECT doc_id, $sigBandCols FROM sig),
       |bl AS (SELECT doc_id, b, bh FROM bands
       |       UNPIVOT (bh FOR b IN (${(0 until Bands).map("band" + _).mkString(", ")})))""".stripMargin

  val minhashLshSql: String =
    s"""WITH $sigBandCtePrefix,
       |cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db
       |         FROM bl a JOIN bl b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
       |SELECT cand.da, cand.db,
       |  round(CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE), 6) AS est_jaccard
       |FROM cand JOIN sig a ON cand.da = a.doc_id JOIN sig b ON cand.db = b.doc_id
       |WHERE CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE) >= CAST('0.5' AS DOUBLE)
       |ORDER BY da, db""".stripMargin

  /** Delta modulus: docs with doc_id % 20 == 0 play the incoming batch. */
  val DeltaMod = 20

  /** Incremental LSH dedup — the daily-increment serving shape: the delta
    * batch's signatures are computed fresh (only the delta pays the
    * shingle/minhash cost); the existing corpus side is a SCAN of the
    * persisted signature layout with the delta excluded
    * ([[Dedup.lshIncrementalPairs]]). */
  def incrementalLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = VectorModel.documents(spark, dir)
    val deltaSig = Dedup.minhashSignatures(
      docs.where(col("doc_id") % DeltaMod === 0), "doc_id", "text",
      NumHashes, ShingleK)
    val corpusSig = spark.read.parquet(sigLayout(spark, dir))
      .where(col("doc") % DeltaMod =!= 0)
    Dedup.lshIncrementalPairs(deltaSig, corpusSig, NumHashes, Bands, 0.5)
      .orderBy("new_doc", "dup_of")
  }

  val incrementalLshSql: String =
    s"""WITH $sigBandCtePrefix,
       |cand AS (SELECT DISTINCT a.doc_id new_doc, b.doc_id dup_of
       |         FROM bl a JOIN bl b ON a.b = b.b AND a.bh = b.bh
       |         WHERE a.doc_id % $DeltaMod = 0 AND b.doc_id % $DeltaMod <> 0)
       |SELECT cand.new_doc, cand.dup_of,
       |  round(CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE), 6) AS est_jaccard
       |FROM cand JOIN sig a ON cand.new_doc = a.doc_id JOIN sig b ON cand.dup_of = b.doc_id
       |WHERE CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE) >= CAST('0.5' AS DOUBLE)
       |ORDER BY new_doc, dup_of""".stripMargin

  /** Fuzzy decontamination Jaccard floor: a training doc is flagged when
    * its banded MinHash estimate against any eval doc reaches this. The
    * same operating point as every other MinHash consumer here — a
    * near-dup-grade floor, deliberately stricter than "any shared gram"
    * (the exact path's bar) because the fuzzy flag DROPS docs wholesale
    * in the train-corpus composition. */
  val FuzzyDecontamThreshold = 0.5

  /** Fuzzy (MinHash) decontamination
    * ([[Dedup.fuzzyContaminatedFromSig]]): training docs whose banded
    * signature collides with any eval doc (source = EvalSource) at
    * est ≥ [[FuzzyDecontamThreshold]] — the near-dup complement of
    * `pipe_decontaminate`'s exact 4-gram overlap, catching eval items
    * shorter than the exact gram width and paraphrase-grade near-dups.
    * Eval signatures are computed fresh (the eval set is the bounded
    * delta side); the corpus side is the persisted signature layout with
    * the eval docs anti-joined out (bounded side → broadcast). */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = VectorModel.documents(spark, dir)
    val evalDocs = docs.where(col("source") === PipelineQueries.EvalSource)
    val corpusSig = spark.read.parquet(sigLayout(spark, dir))
      .join(evalDocs.select(col("doc_id").as("doc")), Seq("doc"), "left_anti")
    Dedup.fuzzyContaminatedFromSig(evalDocs, corpusSig, "doc_id", "text",
        ShingleK, NumHashes, Bands, FuzzyDecontamThreshold)
      .select(col("doc").as("doc_id"), col("n_eval_matches"),
        col("max_est_jaccard"))
      .orderBy("doc_id")
  }

  /** CTE chain → `fscored(doc_id, est)`: per-(eval, training)-pair
    * estimates that band-collide and clear the floor — the banding-
    * semantics mirror of [[decontaminateFuzzy]], factored so its two
    * consumers ([[decontaminateFuzzySql]],
    * [[PipelineQueries.trainCorpusFuzzySql]]) share one definition.
    * Names are f-prefixed to compose beside the component/gram CTEs. */
  private[graft] def fuzzyScoredCtes: String =
    s"""$sigBandCtePrefix,
       |fev AS (SELECT doc_id FROM documents WHERE source = '${PipelineQueries.EvalSource}'),
       |fcand AS (SELECT DISTINCT a.doc_id ev_doc, b.doc_id doc_id
       |          FROM bl a JOIN bl b ON a.b = b.b AND a.bh = b.bh
       |          WHERE a.doc_id IN (SELECT doc_id FROM fev)
       |            AND b.doc_id NOT IN (SELECT doc_id FROM fev)),
       |fscored AS (SELECT fcand.doc_id,
       |    round(CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE), 6) AS est
       |  FROM fcand JOIN sig a ON fcand.ev_doc = a.doc_id
       |             JOIN sig b ON fcand.doc_id = b.doc_id
       |  WHERE CAST($sigMatches AS DOUBLE)/CAST('$NumHashes.0' AS DOUBLE)
       |    >= CAST('$FuzzyDecontamThreshold' AS DOUBLE))""".stripMargin

  lazy val decontaminateFuzzySql: String =
    s"""WITH $fuzzyScoredCtes
       |SELECT doc_id, count(*) AS n_eval_matches, max(est) AS max_est_jaccard
       |FROM fscored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs at hamming ≤ 12 over 60-bit fingerprints. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.simhash(VectorModel.documents(spark, dir), "doc_id", "text", ShingleK)
    Dedup.simhashPairs(sh, 12).orderBy("da", "db")
  }

  val simhashPairsSql: String = {
    val sums = (0 until 60)
      .map(b => s"sum(CASE WHEN (hw >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val combine = (0 until 60)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH $shingleCte,
       |h AS (SELECT doc_id, ('0x'||substr(md5(sg),1,15))::BIGINT AS hw FROM sgl),
       |bits AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $combine AS simhash FROM bits)
       |SELECT a.doc_id da, b.doc_id db, CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
       |ORDER BY da, db""".stripMargin
  }

  /** Embedding-cosine near-dup pairs, blocked by label, threshold 0.4.
    * Registered with `broadcastBuild = false` — the co-partitioned
    * shuffle-join shape that survives past the broadcast/driver limit is
    * the one the bench exercises; DedupSpec proves it value-identical to
    * the broadcast path. */
  def embeddingCosine(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupPairs(VectorModel.embeddings(spark, dir),
      "vec_id", "embedding", "label", VectorModel.EmbDim, 0.4,
      broadcastBuild = false)
      .orderBy("da", "db")

  val embeddingCosineSql: String = {
    val sim = OracleSql.cosineCols(
      OracleSql.listElem("a.embedding"), OracleSql.listElem("b.embedding"),
      VectorModel.EmbDim)
    s"""SELECT a.vec_id da, b.vec_id db, a.label AS block, round($sim, 6) AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $sim >= CAST('0.4' AS DOUBLE)
       |ORDER BY da, db""".stripMargin
  }

  /** SEMANTIC dedup keepers (the SemDeDup-style pruning stage a training
    * pipeline runs over embeddings, composing two gated operators): the
    * exact embedding-cosine near-dup pairs become an undirected graph,
    * every vector is labeled with its connected component (min reachable
    * id — [[Dedup.connectedComponents]], the same min-label propagation
    * as the text-side keepers), and `kept = 1` marks the component
    * representative — the rows a semantic prune retains. Unlike
    * text-level dedup this removes MEANING-level duplicates (paraphrases,
    * re-encodings) that share no n-grams. */
  def semanticKeepers(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(semanticCcLayout(spark, dir))
      .withColumn("kept", (col("vec_id") === col("component")).cast("int"))
      .orderBy("vec_id")

  /** Build-once/serve-many semantic COMPONENT layout over the
    * exact-cosine pair graph — the [[componentLayout]] discipline on the
    * embedding side: the pair pipeline and the star-contraction both run
    * once per dataset dir, and `dd_semantic_keepers` serves from a scan.
    * The pair set is written to scratch parquet before the CC loop (the
    * [[pairLayout]] lesson): the label-propagation loop references its
    * edge input every iteration, and nesting a deep self-join lineage
    * ~diameter times blows the driver's plan bookkeeping (measured: OOM
    * at sf0.1 for the bucketed pipeline) — a parquet-backed edge list
    * keeps every iteration's plan flat. Exposed as the Bench build step
    * `build_semantic_cc_layout`. */
  private[graft] def semanticCcLayout(spark: SparkSession, dir: String): String =
    semanticCcLayoutCache.computeIfAbsent(dir, _ => {
      val emb = VectorModel.embeddings(spark, dir)
      val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        "label", VectorModel.EmbDim, 0.4, broadcastBuild = false)
        .select(col("da"), col("db"))
      semanticCcBuild(spark, emb, pairs, "graft_semantic_cc")
    })

  private val semanticCcLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** [[semanticCcLayout]]'s twin over the IVF-bucketed pair layout
    * ([[embPairLayout]]) — `dd_semantic_ivf` serves from a scan of it.
    * Exposed as the Bench build step `build_semantic_cc_ivf_layout`. */
  private[graft] def semanticCcIvfLayout(spark: SparkSession, dir: String): String =
    semanticCcIvfLayoutCache.computeIfAbsent(dir, _ => {
      val emb = VectorModel.embeddings(spark, dir)
      val pairs = spark.read.parquet(embPairLayout(spark, dir))
        .select(col("da"), col("db"))
      semanticCcBuild(spark, emb, pairs, "graft_semantic_cc_ivf")
    })

  private val semanticCcIvfLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared build body: materialize the pair set, contract, persist the
    * full (vec_id, component) assignment. */
  private def semanticCcBuild(spark: SparkSession, emb: DataFrame,
      pairs: DataFrame, scratchName: String): String = {
    val root = graft.store.Fs.scratchDir(spark, scratchName)
    val pp = s"$root/pairs"
    pairs.write.mode("overwrite").parquet(pp)
    val p = s"$root/components"
    Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id",
        spark.read.parquet(pp))
      .write.mode("overwrite").parquet(p)
    p
  }

  /** The LABEL-FREE scale twin of [[semanticKeepers]]: pair discovery via
    * the IVF-bucketed self-join ([[Dedup.embeddingNearDupPairsBucketed]] —
    * learned blocking, multi-probe boundary handling, no all-pairs join,
    * no block column required) feeding the same components → keepers
    * composition. This is the variant a 100 TB corpus actually runs: the
    * exact stage's label blocking assumes a partition key that usually
    * doesn't exist, and without one the exact pair join is quadratic.
    * Approximate in PAIR RECALL only (reported keepers are exact given
    * the discovered pairs) → rows-only in the driver contract; DedupSpec
    * gates keeper agreement against the exact stage. */
  def semanticKeepersBucketed(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(semanticCcIvfLayout(spark, dir))
      .withColumn("kept", (col("vec_id") === col("component")).cast("int"))
      .orderBy("vec_id")

  /** Persisted IVF-bucketed embedding pair set (fit + candidate join +
    * exact threshold, written once per dataset) — the build-once/serve-
    * many split the text side already has ([[pairLayout]]): BOTH bucketed
    * consumers (`dd_embedding_ivf`, `dd_semantic_ivf`) serve from it, so
    * the corpus-wide similarity join runs once, not once per query.
    * Exposed as the Bench build step `build_emb_pair_layout`. */
  private[graft] def embPairLayout(spark: SparkSession, dir: String): String =
    embPairLayoutCache.computeIfAbsent(dir, _ => {
      val emb = VectorModel.embeddings(spark, dir)
      val (_, model) = graft.index.Ivf.fit(emb, vecCol = "embedding", idCol = "vec_id")
      // the SAME seeded fit the ann entries publish — the bucketed-pair
      // oracles read it back (build-time write, repair no-op at serves)
      ApproxQueries.publishCentroidsFlat(spark, "ivf_centroids_emb", dir,
        model.centroids)
      val p = graft.store.Fs.scratchDir(spark, "graft_emb_pairs") + "/pairs"
      Dedup.embeddingNearDupPairsBucketed(emb, model,
        "vec_id", "embedding", 0.4, nProbes = 4)
        .write.mode("overwrite").parquet(p)
      p
    })

  private val embPairLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Recursive-CTE mirror over the embedding-pair oracle nested verbatim
    * (the [[componentsSql]] pattern) — the gate covers the whole
    * composition: exact cosines, thresholding, reachability closure,
    * min-label components, keeper flags. */
  lazy val semanticKeepersSql: String =
    s"""WITH RECURSIVE pairs AS ($embeddingCosineSql),
       |edges AS (SELECT da AS src, db AS dst FROM pairs
       |          UNION ALL SELECT db AS src, da AS dst FROM pairs),
       |reach(v, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
       |SELECT v AS vec_id, min(r) AS component,
       |  CAST(CASE WHEN v = min(r) THEN 1 ELSE 0 END AS INT) AS kept
       |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin

  /** Build-once/serve-many MLlib MinHashLSH artifact: the shingle-feature
    * projection (cached — ML `VectorUDT` features, the model-registry
    * shape) plus the fitted model. Exposed so Bench times it as
    * `build_mllib_lsh_model`; serving then times the similarity join
    * only. */
  private[graft] def mllibLshModel(spark: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.ml.feature.MinHashLSHModel) = {
    // features ride the bounded CacheRegistry (evictable, re-derivable
    // from lineage); only the fitted model — a handful of coefficients —
    // memoizes unconditionally. Pinning the 2^18-dim feature frames per
    // dataset dir forever would squeeze every other operator's storage.
    val feat = graft.store.CacheRegistry.cached(MllibLsh.shingleFeatures(
      VectorModel.documents(spark, dir), "doc_id", "text"))
    val model = mllibModelCache.computeIfAbsent(dir, _ => MllibLsh.fit(feat))
    (feat, model)
  }

  private val mllibModelCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.ml.feature.MinHashLSHModel]()

  /** MLlib MinHashLSH approximate similarity join (seeded; rows-only check
    * — recall-gated in DedupSpec against the exact operator), served with
    * the memoized model + feature cache. */
  def mllibLshJoin(spark: SparkSession, dir: String): DataFrame = {
    val (feat, model) = mllibLshModel(spark, dir)
    MllibLsh.joinPairs(model, feat, 0.5)
  }

  /** Sampling modulus for the CJK dedup gate: keeps the quadratic
    * identical-text classes bench-sized at sf0.1 while every SF still
    * yields pairs (doc_id % 23 covers all (sentence, pad) classes). */
  val CjkDedupModulus = 23

  /** CJK n-gram dedup gate — the dedup leg of the CJK tokenization
    * fallback (tx_cjk_bm25 is the retrieval leg): exact 3-gram Jaccard
    * pairs over the bigram-normalized CJK fixture corpus
    * ([[TextQueries.cjkCorpus]], subsampled). On raw whitespace tokens
    * every sentence is ONE token, no doc reaches the ≥3-token floor, and
    * this returns nothing — the gate fails unless the fallback actually
    * tokenizes. Near-dup sentence pairs and identical-text classes both
    * surface, with the same md5-free exact arithmetic as
    * `dd_ngram_jaccard`. */
  def cjkNgramDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
      TextQueries.cjkCorpus(spark, dir).where(col("doc_id") % CjkDedupModulus === 0),
      "doc_id", "text", ShingleK, 0.5)
      .orderBy("da", "db")

  lazy val cjkNgramDedupSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM (${TextQueries.cjkCorpusSql})
       |  WHERE doc_id % $CjkDedupModulus = 0),
       |sgl AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [toks[i]||' '||toks[i+1]||' '||toks[i+2] for i in range(1, len(toks)-1)])) AS sg
       |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM corpus)
       |  WHERE len(toks) >= $ShingleK),
       |pairs AS (
       |  SELECT a.doc_id da, b.doc_id db, count(*) inter
       |  FROM sgl a JOIN sgl b ON a.sg = b.sg AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, count(*) n FROM sgl GROUP BY doc_id)
       |SELECT da, db, round(CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
       |FROM pairs JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(inter AS DOUBLE)/CAST(sa.n + sb.n - inter AS DOUBLE) >= CAST('0.5' AS DOUBLE)
       |ORDER BY da, db""".stripMargin

  /** IVF-bucketed embedding near-dup pairs — the label-free scale twin of
    * `dd_embedding_cosine` (learned blocking, 4-probe boundary handling,
    * exact cosines on candidates). K-means makes it rows-only in the
    * driver contract; DedupSpec gates recall against the all-pairs ground
    * truth and exactness of every reported similarity. */
  def embeddingIvf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(embPairLayout(spark, dir))
      .orderBy("da", "db")

  /** Pair mirror of [[Dedup.embeddingNearDupPairsBucketed]] GIVEN the
    * published embeddings-family centroids (the SAME seeded fit the
    * layout build runs): per-row top-4 probe clusters (centroid cosine,
    * ties to the lower id), members from the re-derived assignment,
    * exact cosine ≥ 0.4 on the RAW sim, canonical (da < db) + distinct —
    * cosine is exactly symmetric in IEEE, so both orientations collapse
    * to identical rows. No ORDER BY: [[embeddingIvfSql]] adds it;
    * [[semanticIvfSql]] nests this under the reachability closure. */
  private lazy val embeddingIvfPairsSql: String = {
    val d = VectorModel.EmbDim
    def cE(i: Int) = s"cent.c$i"
    def qaE(i: Int) = s"CAST(qa.embedding[${i + 1}] AS DOUBLE)"
    def qbE(i: Int) = s"CAST(qb.embedding[${i + 1}] AS DOUBLE)"
    def rowE(alias: String)(i: Int) = s"CAST($alias.embedding[${i + 1}] AS DOUBLE)"
    s"""WITH cent AS (SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
       |    ${(0 until d).map(j => s"c$j").mkString(", ")}
       |  FROM ${OracleSidecars.sqlTable("ivf_centroids_emb")}),
       |asg AS (SELECT vec_id, cluster_id FROM (
       |  SELECT a.vec_id, cent.cluster_id,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${OracleSql.l2sq(cE, rowE("a"), d)} ASC, cent.cluster_id ASC) AS arn
       |  FROM embeddings a CROSS JOIN cent) WHERE arn = 1),
       |pr AS (SELECT vec_id, cluster_id FROM (
       |  SELECT q.vec_id, cent.cluster_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${OracleSql.cosineCols(cE, rowE("q"), d)} DESC, cent.cluster_id ASC) AS prn
       |  FROM embeddings q CROSS JOIN cent) WHERE prn <= 4),
       |cp AS (SELECT pa, pb, sim_raw FROM (
       |  SELECT p.vec_id AS pa, m.vec_id AS pb,
       |    ${OracleSql.cosineCols(qaE, qbE, d)} AS sim_raw
       |  FROM pr p
       |    JOIN asg m ON m.cluster_id = p.cluster_id AND m.vec_id <> p.vec_id
       |    JOIN embeddings qa ON qa.vec_id = p.vec_id
       |    JOIN embeddings qb ON qb.vec_id = m.vec_id)
       |  WHERE sim_raw >= ${OracleSql.lit(0.4)})
       |SELECT DISTINCT least(pa, pb) AS da, greatest(pa, pb) AS db,
       |  round(sim_raw, 6) AS sim
       |FROM cp""".stripMargin
  }

  lazy val embeddingIvfSql: String =
    s"""SELECT da, db, sim FROM ($embeddingIvfPairsSql)
       |ORDER BY da, db""".stripMargin

  /** HASH-GATE of [[semanticKeepersBucketed]]: the IVF-bucketed pair
    * mirror nested under the same reachability closure as
    * [[semanticKeepersSql]] — the whole label-free composition
    * (learned blocking, exact cosines, components, keeper flags)
    * value-compared. */
  lazy val semanticIvfSql: String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (SELECT da, db FROM ($embeddingIvfPairsSql)),
       |edges AS MATERIALIZED (SELECT da AS src, db AS dst FROM pairs
       |          UNION ALL SELECT db AS src, da AS dst FROM pairs),
       |reach(v, r) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT reach.v, e.dst FROM reach JOIN edges e ON reach.r = e.src)
       |SELECT v AS vec_id, min(r) AS component,
       |  CAST(CASE WHEN v = min(r) THEN 1 ELSE 0 END AS INT) AS kept
       |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin

  /** Edit-distance fuzzy matching (entity-resolution shape): part-name
    * pairs at Levenshtein ≤ [[FuzzyMaxDist]], blocked on
    * `(p_brand, name-length band)`. Levenshtein(a,b) ≥ |len(a)−len(b)|,
    * so a band of width `FuzzyMaxDist+1` with the probe side exploded to
    * its three adjacent bands is LOSSLESS blocking — every qualifying
    * pair lands in exactly one `(brand, band)` block. Both blocking keys
    * are equi-join keys, so the join SHUFFLES (no build-side broadcast:
    * at 100 TB the table is millions of rows and a broadcast build side
    * would blow the driver/executor ceiling), and the per-block quadratic
    * is |brand ∩ band|², not |brand|² — critical because TPC-H has only
    * 25 brands. The distance itself is a NATIVE expression on both
    * engines (one codegen'd call, identical classic-DP semantics), which
    * keeps the operator hash-gated. */
  val FuzzyMaxDist = 3

  def fuzzyParts(spark: SparkSession, dir: String): DataFrame =
    fuzzyPairs(
      spark.read.parquet(s"$dir/part.parquet")
        .select("p_partkey", "p_brand", "p_name"),
      "p_partkey", "p_brand", "p_name")

  /** The blocked fuzzy-pair join over any (key, block, name) table —
    * shared by the query entry and the skew fixtures in DedupSpec.
    *
    * Skew: natural blocking keys are NOT uniform (a hot brand at a hot
    * name length is a real corpus shape), and the width-pinning
    * REPARTITION_BY_NUM that protects this quadratic stage from AQE's
    * byte-based coalescing also exempts it from AQE's skew-join
    * splitting — so the skew guard is explicit, deterministic salting:
    * the max block size is measured first (one cheap count aggregate vs
    * the |block|² join it protects), and when it exceeds
    * `targetBlockRows`, the probe side is salted by `hash(key) mod S`
    * and the build side replicated S ways, bounding per-task pair work
    * at ~|block|²/S while every qualifying pair still matches exactly
    * once. S=1 (the common balanced case) keeps the unsalted plan.
    * A caller that already knows its block distribution can pass
    * `salts = Some(s)` to pin the factor and skip the measuring
    * aggregate (one job less per serve); `None` keeps the
    * measure-then-decide default. Helper columns are `__fz_`-prefixed so
    * the generic (key, block, name) API cannot collide with caller
    * schemas (guarded below). */
  def fuzzyPairs(rows: DataFrame, keyCol: String, blockCol: String,
      nameCol: String, targetBlockRows: Int = 4096,
      salts: Option[Int] = None): DataFrame = {
    require(!rows.columns.exists(_.startsWith("__fz_")),
      s"fuzzyPairs reserves the __fz_ column prefix; input has " +
        rows.columns.filter(_.startsWith("__fz_")).mkString(", "))
    val bandW = FuzzyMaxDist + 1
    val p = rows.withColumn("__fz_len", length(col(nameCol)))
    val band = floor(col("__fz_len") / bandW)
    val build0 = p.withColumn("__fz_band", band)
    val probe0 = p.withColumn("__fz_band",
      explode(array(band - 1, band, band + 1)))
    val s = salts.getOrElse {
      val maxBlock = build0.groupBy(col(blockCol), col("__fz_band")).count()
        .agg(max("count")).collect().headOption
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
        .getOrElse(0L)
      math.min(64,
        math.max(1, math.ceil(maxBlock.toDouble / targetBlockRows).toInt))
    }
    require(s >= 1 && s <= 1024, s"salt factor $s out of range")
    val (probe, build, keys) =
      if (s == 1) (probe0, build0, Seq(col(blockCol), col("__fz_band")))
      else (
        probe0.withColumn("__fz_salt", pmod(hash(col(keyCol)), lit(s))),
        build0.withColumn("__fz_salt",
          explode(array((0 until s).map(lit(_)): _*))),
        Seq(col(blockCol), col("__fz_band"), col("__fz_salt")))
    val saltEq =
      if (s == 1) lit(true) else col("a.__fz_salt") === col("b.__fz_salt")
    // widenBy pins the shuffle width on the blocking keys (the join
    // shuffles on them anyway, so no extra exchange) and stays exempt
    // from AQE's byte-based coalescing — the per-partition work here is
    // quadratic in rows, not linear in bytes.
    // the merge hint pins the shuffled equi-join at every scale — the
    // build side is the full table, so the planner's small-SF broadcast
    // choice is exactly the plan that dies at 100 TB
    graft.operators.Par.widenBy(probe, keys: _*).as("a")
      .join(build.hint("merge").as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col("a.__fz_band") === col("b.__fz_band") && saltEq &&
          col(s"a.$keyCol") < col(s"b.$keyCol") &&
          abs(col("a.__fz_len") - col("b.__fz_len")) <= FuzzyMaxDist)
      .withColumn("dist",
        levenshtein(col(s"a.$nameCol"), col(s"b.$nameCol")).cast("long"))
      .where(col("dist") <= FuzzyMaxDist)
      .select(col(s"a.$keyCol").as("da"), col(s"b.$keyCol").as("db"),
        col("dist"))
      .orderBy("da", "db")
  }

  val fuzzyPartsSql: String =
    s"""SELECT a.p_partkey AS da, b.p_partkey AS db,
       |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
       |FROM part a JOIN part b
       |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
       |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
       |ORDER BY da, db""".stripMargin

  /** Canonical-URL exact-dup groups ([[graft.text.Urls]]) — the crawl's
    * FIRST dedup pass, before any content byte is compared: the planted
    * URL-variant fixture canonicalizes (case, default ports, tracking
    * params, fragments, slash runs) and groups on the canonical key with
    * the [[exact]] keeper convention. Pure string expressions + one
    * group-by shuffle; the canonicalization chain mirrors 1:1 in the
    * oracle. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Urls
    Urls.urlCorpus(VectorModel.documents(spark, dir))
      .select(col("doc_id"), Urls.canonical(col("url")).as("curl"))
      .groupBy("curl")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")
  }

  val urlDedupSql: String =
    s"""WITH ${graft.text.Urls.canonicalCtesSql(graft.text.Urls.urlCorpusSql)}
       |SELECT curl, min(doc_id) AS keeper, count(*) AS n_copies
       |FROM ucanon GROUP BY curl ORDER BY keeper""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_url_dedup" -> (urlDedup _),
    "dd_fuzzy_parts" -> (fuzzyParts _),
    "dd_cjk_ngram" -> (cjkNgramDedup _),
    "dd_embedding_ivf" -> (embeddingIvf _),
    "dd_mllib_lsh" -> (mllibLshJoin _),
    "dd_repeated_ngrams" -> (repeatedNgrams _),
    "dd_span_scrub" -> (spanScrub _),
    "dd_span_scrub_text" -> (spanScrubText _),
    "dd_span_maximal" -> (spanMaximal _),
    "dd_components" -> (components _),
    "dd_dup_mass" -> (dupMass _),
    "dd_components_incremental" -> (componentsIncremental _),
    "dd_quality_keepers" -> (qualityKeepers _),
    "dd_ngram_capped" -> (ngramJaccardCapped _),
    "dd_exact" -> (exact _),
    "dd_ngram_jaccard" -> (ngramJaccard _),
    "dd_minhash_lsh" -> (minhashLsh _),
    "dd_incremental_lsh" -> (incrementalLsh _),
    "pipe_decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "dd_simhash" -> (simhashPairs _),
    "dd_embedding_cosine" -> (embeddingCosine _),
    "dd_semantic_keepers" -> (semanticKeepers _),
    "dd_semantic_ivf" -> (semanticKeepersBucketed _))

  val oracleSql: Map[String, String] = Map(
    "dd_url_dedup" -> urlDedupSql,
    "dd_fuzzy_parts" -> fuzzyPartsSql,
    "dd_cjk_ngram" -> cjkNgramDedupSql,
    "dd_ngram_capped" -> ngramJaccardCappedSql,
    "dd_repeated_ngrams" -> repeatedNgramsSql,
    "dd_span_scrub" -> spanScrubSql,
    "dd_span_scrub_text" -> spanScrubTextSql,
    "dd_span_maximal" -> spanMaximalSql,
    "dd_components" -> componentsSql,
    "dd_dup_mass" -> dupMassSql,
    "dd_components_incremental" -> componentsSql,
    "dd_quality_keepers" -> qualityKeepersSql,
    "dd_exact" -> exactSql,
    "dd_ngram_jaccard" -> ngramJaccardSql,
    "dd_minhash_lsh" -> minhashLshSql,
    "dd_incremental_lsh" -> incrementalLshSql,
    "pipe_decontaminate_fuzzy" -> decontaminateFuzzySql,
    "dd_simhash" -> simhashPairsSql,
    "dd_embedding_cosine" -> embeddingCosineSql,
    "dd_semantic_keepers" -> semanticKeepersSql,
    "dd_embedding_ivf" -> embeddingIvfSql,
    "dd_semantic_ivf" -> semanticIvfSql)
}
