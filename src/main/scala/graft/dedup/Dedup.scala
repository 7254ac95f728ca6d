package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Par

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * All hashing is derived from md5 so the DuckDB oracle recomputes identical
  * signatures; everything is expression-level (codegen'd, no UDFs).
  *
  * Scale notes (100 TB):
  *  - Exact dedup is one hash-shuffle on a 16-byte key — the cheapest path;
  *    run it first to shrink the input to the fuzzy stages.
  *  - Shingle-join candidate generation is quadratic per shingle bucket; at
  *    scale cap the document frequency of join shingles (hot-shingle skew)
  *    and/or go through MinHash bands (constant fan-out per doc) as done in
  *    [[lshCandidatePairs]]. Band join keys are md5 strings — uniformly
  *    distributed, no skew salting needed.
  *  - SimHash pair generation here is a blocked self-join; at scale, block
  *    on bit-bands of the fingerprint (pigeonhole: hamming ≤ k ⇒ some
  *    band of 60/(k+1) bits matches exactly) instead of the cross join.
  */
object Dedup {

  /** Word k-shingles (distinct) of a whitespace-tokenized text column.
    * Requires ≥ k tokens (callers filter shorter docs in both engines). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Exact-duplicate groups by content hash: one row per distinct content,
    * keeper = min id. A single hash-shuffle; the canonical first pass. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Skew-capped variant of [[ngramJaccardPairs]] for web-scale corpora:
    * candidate pairs come only from shingles whose document frequency is
    * ≤ maxDocFreq (hot shingles generate O(df²) join rows — the skew
    * bottleneck), then the TRUE Jaccard is recomputed over the full
    * distinct-shingle sets with array_intersect, so reported similarities
    * are exact. The only approximation is candidate recall: a pair sharing
    * *only* hot shingles is missed — for near-dup thresholds this is
    * vanishing (a j ≥ t pair shares ≥ t/(1+t) of either set; all of those
    * being globally hot is a measure-zero corpus pathology), and DedupSpec
    * asserts equality with the uncapped operator on the test corpus.
    * maxDocFreq must be ≥ 2: a shingle shared by any pair has df ≥ 2 by
    * definition, so a cap of 1 yields no candidates at all. */
  def ngramJaccardPairsCapped(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 100): DataFrame = {
    // Widen the raw scan FIRST: tokenize/shingle expressions are the
    // dominant per-row cost and must not run in a single pre-exchange map
    // task over a one-file scan. Shingles are 60-bit-hashed ONCE up front:
    // the verification join then shuffles long arrays instead of string
    // arrays (~8x lighter) and intersects integers. Collisions within a
    // doc pair's ~10^2 shingles are a 2^-60-scale event — the DuckDB
    // value-equality gate would catch one.
    val sh = Par.widen(df)
      .where(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc"),
        array_distinct(transform(shingles(col(textCol), k), s => hash60(s))).as("shh"))
      .cache()
    val ex = sh.select(col("doc"), explode(col("shh")).as("sg"))
    val rare = ex.groupBy("sg").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq)
      .select("sg")
    val rareEx = Par.widenBy(ex.join(rare, "sg"), col("sg"))
    val cand = rareEx.as("a").join(rareEx.hint("shuffle_hash").as("b"),
        col("a.sg") === col("b.sg") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("da"), col("b.doc").as("db"))
      .distinct()
    cand
      .join(sh.select(col("doc").as("da"), col("shh").as("sha")), "da")
      .join(sh.select(col("doc").as("db"), col("shh").as("shb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Candidate pairs sharing at least one shingle, with exact Jaccard
    * similarity over distinct shingle sets. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Widen the raw scan first — see ngramJaccardPairsCapped.
    val sh = Par.widen(df)
      .where(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc"), shingles(col(textCol), k).as("sh"))
    val sizes = sh.select(col("doc"), size(col("sh")).as("n"))
    // Widen on the join key BEFORE the pair join: the candidate fan-out is
    // Σ df(shingle)² — quadratic work that must not run at scan parallelism.
    val ex = Par.widenBy(
      sh.select(col("doc"), explode(col("sh")).as("sg")), col("sg"))
    // Both sides are co-partitioned by sg after the widen; shuffle-hash
    // reuses that exchange instead of collecting the exploded table to the
    // driver for a broadcast — which is also the only join shape that
    // exists once the corpus outgrows the broadcast threshold.
    val inter = ex.as("a").join(ex.hint("shuffle_hash").as("b"),
        col("a.sg") === col("b.sg") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("da"), col("b.doc").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit hash of a string via md5 (mirrored by the oracle as
    * ('0x' || substr(md5(s),1,15))::BIGINT). */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Mersenne prime modulus for the minhash function family. */
  val MinhashP: Long = (1L << 31) - 1

  /** Deterministic coefficients for hash function j (values < 2^31 so
    * (a * (h mod p)) stays within 63 bits). */
  def minhashA(j: Int): Long = 2L * j + 3
  def minhashB(j: Int): Long = 7L * j + 1

  /** MinHash signature columns h0..h{n-1}: per-doc min over shingles of
    * h_j(s) = (a_j * (md5_60(s) mod p) + b_j) mod p — one md5 per shingle,
    * the rest integer arithmetic (universal-hash family, mirrored exactly
    * by the oracle SQL). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, k: Int = 3): DataFrame = {
    // Widen the raw scan first — see ngramJaccardPairsCapped.
    val ex = Par.widen(df)
      .where(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc"), explode(shingles(col(textCol), k)).as("sg"))
      .select(col("doc"), (hash60(col("sg")) % MinhashP).as("hm"))
    val hashCols = (0 until numHashes).map(j =>
      min((lit(minhashA(j)) * col("hm") + minhashB(j)) % MinhashP).as(s"h$j"))
    ex.groupBy("doc").agg(hashCols.head, hashCols.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band (band hash = md5 of the
    * band's signature slice), with estimated Jaccard = matching-hash
    * fraction of the two signatures. */
  def lshCandidatePairs(sig: DataFrame, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val rpb = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws(",", (0 until rpb).map(r => col(s"h${b * rpb + r}").cast("string")): _*))
    }
    // sig is post-shuffle (groupBy output): spread unconditionally — AQE
    // would otherwise coalesce it to one partition by bytes and serialize
    // the band self-join.
    val bl = Par.spread(
      sig.select(col("doc"), posexplode(array(bandCols: _*)).as(Seq("band", "bh"))),
      col("band"), col("bh"))
    val cand = bl.as("a").join(bl.hint("shuffle_hash").as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("da"), col("b.doc").as("db"))
      .distinct()
    val est = (0 until numHashes)
      .map(j => when(col(s"a.h$j") === col(s"b.h$j"), 1).otherwise(0))
      .reduceLeft[Column](_ + _)
      .cast("double") / lit(numHashes.toDouble)
    cand.join(sig.as("a"), col("da") === col("a.doc"))
      .join(sig.as("b"), col("db") === col("b.doc"))
      .select(col("da"), col("db"), round(est, 6).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** 60-bit SimHash over distinct shingles: bit b is the sign of the sum of
    * ±1 votes from each shingle's hash bit b. */
  def simhash(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
      bits: Int = 60): DataFrame = {
    // Widen the raw scan first — see ngramJaccardPairsCapped.
    val ex = Par.widen(df)
      .where(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc"), explode(shingles(col(textCol), k)).as("sg"))
      .select(col("doc"), hash60(col("sg")).as("hw"))
    val voteCols = (0 until bits).map(b =>
      sum(when(shiftright(col("hw"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val votes = ex.groupBy("doc").agg(voteCols.head, voteCols.tail: _*)
    votes.select(col("doc"),
      (0 until bits).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduceLeft[Column](_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming.
    *
    * The pair join is a broadcast nested loop (no equi key); the probe side
    * is spread to session parallelism so the n²/2 comparisons run on every
    * core — sh is a groupBy output that AQE would otherwise coalesce to one
    * partition. At a hamming budget this loose (12/60 bits) band-blocking
    * prunes almost nothing (P[band match] ≈ 2⁻⁴·⁶ per 13 pigeonhole bands),
    * so the scale path is a tighter budget + banding, not this operator. */
  def simhashPairs(sh: DataFrame, maxHamming: Int = 12): DataFrame = {
    // Explicit side choice: broadcast the (tiny: doc id + 1 long) build side,
    // stream the spread side — otherwise the planner may broadcast the wide
    // side and stream the AQE-coalesced single partition serially.
    val wide = Par.spread(sh)
    wide.as("a").join(broadcast(sh).as("b"), col("a.doc") < col("b.doc"))
      .withColumn("hamming", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("a.doc").as("da"), col("b.doc").as("db"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs within a blocking column (e.g. a
    * cluster/label id — at scale, an LSH or IVF bucket).
    *
    * The stream side is widened ROUND-ROBIN, not hashed by block: a
    * low-cardinality block column (10 labels here) hash-partitions into a
    * handful of skewed partitions. With the block side broadcast, every
    * stream partition probes independently — parallelism without skew. At
    * scale the block column is a high-cardinality bucket id and this join
    * becomes a co-partitioned shuffle join on it instead. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, dim: Int, threshold: Double,
      broadcastBuild: Boolean = true): DataFrame = {
    val wide = Par.widen(df)
    // broadcastBuild = false for tables past the broadcast/driver limit:
    // falls back to the planner's shuffle join on the block column (the
    // co-partitioned shape a high-cardinality bucket id gives at scale).
    val build = if (broadcastBuild) broadcast(df) else df
    wide.as("a").join(build.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("sim_raw",
        graft.GraftExtensions.cosineSim(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .where(col("sim_raw") >= threshold)
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"),
        col(s"a.$blockCol").as("block"), round(col("sim_raw"), 6).as("sim"))
  }
}
