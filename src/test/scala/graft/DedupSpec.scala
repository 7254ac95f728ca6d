package graft

import graft.dedup.Dedup
import graft.model.VectorModel

/** Dedup family cross-consistency: the approximate families must recover
  * the exact n-gram Jaccard near-dup pairs. */
class DedupSpec extends SparkSpec {

  lazy val docs = VectorModel.documents(spark, Sf0001).cache()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs = pairSet(
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))

  test("planted near-duplicates exist in the corpus") {
    assert(exactPairs.nonEmpty)
  }

  test("MinHash-LSH recovers all high-Jaccard pairs (recall 1.0 expected at j>=0.5)") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val lsh = pairSet(Dedup.lshCandidatePairs(sig, threshold = 0.5))
    val recall = exactPairs.intersect(lsh).size.toDouble / exactPairs.size
    info(s"minhash recall of jaccard>=0.5 pairs: $recall")
    assert(recall >= 0.9)
  }

  test("MLlib MinHashLSH approx join recovers high-Jaccard pairs") {
    val pairs = pairSet(graft.dedup.MllibLsh.approxJaccardPairs(
      docs, "doc_id", "text", 0.5))
    val recall = exactPairs.intersect(pairs).size.toDouble / exactPairs.size
    info(s"mllib minhash-lsh recall of jaccard>=0.5 pairs: $recall")
    assert(recall >= 0.9)
    // precision on reported similarity: every returned pair is >= threshold
    assert(graft.dedup.MllibLsh.approxJaccardPairs(docs, "doc_id", "text", 0.5)
      .where(org.apache.spark.sql.functions.col("est_jaccard") < 0.5).count() === 0L)
  }

  test("SimHash hamming<=12 recovers high-Jaccard pairs") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val pairs = pairSet(Dedup.simhashPairs(sh, 12))
    val recall = exactPairs.intersect(pairs).size.toDouble / exactPairs.size
    info(s"simhash recall: $recall")
    assert(recall >= 0.9)
  }

  test("banded jaccard equals the uncapped operator on this corpus") {
    val banded = pairSetWithSim(
      Dedup.ngramJaccardPairsBanded(docs, "doc_id", "text", 3, 0.5))
    val full = pairSetWithSim(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(banded === full)
  }

  test("banded simhash join is exact (equals all-pairs) and has no nested-loop join") {
    val sh = Dedup.simhash(docs, "doc_id", "text").cache()
    val banded = Dedup.simhashPairs(sh, 12)
    val allPairs = sh.as("a")
      .join(org.apache.spark.sql.functions.broadcast(sh).as("b"),
        org.apache.spark.sql.functions.col("a.doc") < org.apache.spark.sql.functions.col("b.doc"))
      .select(
        org.apache.spark.sql.functions.col("a.doc").as("da"),
        org.apache.spark.sql.functions.col("b.doc").as("db"),
        org.apache.spark.sql.functions.bit_count(
          org.apache.spark.sql.functions.col("a.simhash")
            .bitwiseXOR(org.apache.spark.sql.functions.col("b.simhash"))).cast("long").as("hamming"))
      .where(org.apache.spark.sql.functions.col("hamming") <= 12)
    def hset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hset(banded) === hset(allPairs))
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"banded simhash plan has a nested loop join:\n$plan")
  }

  private def pairSetWithSim(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("exact groups: group count equals distinct contents; sizes sum to n") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").cache()
    val n = docs.count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(groups.count() === distinctTexts)
    val total = groups.agg(org.apache.spark.sql.functions.sum("n_copies"))
      .collect()(0).getLong(0)
    assert(total === n)
  }

  test("embedding near-dup pairs all meet the threshold and block equality") {
    val emb = VectorModel.embeddings(spark, Sf0001)
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", "label",
      VectorModel.EmbDim, 0.3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("sim") >= 0.3))
  }

  test("connected components: chain, clique, and singleton all label to min id") {
    import spark.implicits._
    // components: {1,2,3,4} via a chain (worst diameter), {10,11,12} via a
    // clique, {20} isolated
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("da", "db")
    val got = Dedup.connectedComponents(verts, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("IVF-bucketed embedding near-dup: exact sims, high recall vs all-pairs ground truth") {
    import org.apache.spark.sql.functions._
    val emb = VectorModel.embeddings(spark, Sf0001)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val threshold = 0.4
    // all-pairs ground truth (label-free — the semantics the bucketed
    // twin targets), computed exactly driver-side on the tiny SF
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= threshold
    } yield {
      val (a, b) = (rows(i)._1, rows(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    val (_, model) = graft.index.Ivf.fit(emb, vecCol = "embedding", idCol = "vec_id")
    val bucketedDf = Dedup.embeddingNearDupPairsBucketed(emb, model, "vec_id", "embedding",
      threshold, nProbes = 4)
    // the scale shape of the BUILDING pipeline (dd_embedding_ivf now
    // serves its persisted output): candidates come from the
    // co-partitioned probe equi-join, never an all-pairs nested loop
    val plan = bucketedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketed pair discovery must stay equi-join shaped:\n" + plan.take(2000))
    val got = bucketedDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision is exact: every reported pair is a true pair with the true cosine
    val byPair = rows.toMap
    got.foreach { case (da, db, sim) =>
      assert(truth.contains((da, db)), s"($da,$db) not a true pair")
      assert(math.abs(sim - cos(byPair(da), byPair(db))) < 1e-6)
    }
    // recall: 4-probe learned blocking must recover most true pairs
    val recall = got.map(t => (t._1, t._2)).toSet.size.toDouble / truth.size
    assert(recall >= 0.7, s"bucketed recall $recall below 0.7 (${got.length}/${truth.size})")
  }

  test("semantic keepers: both stages judged against all-pairs ground-truth keepers") {
    import org.apache.spark.sql.functions._
    import graft.queries.DedupQueries
    // ground truth: all-pairs components at the same threshold, driver-side
    // union-find — NEITHER registered stage sees every pair (the oracle
    // stage is label-blocked, the scale twin IVF-blocked), so truth is the
    // only fair judge; notably the label-free twin can DISCOVER cross-label
    // pairs the label-blocked stage structurally cannot
    val rows = graft.model.VectorModel.embeddings(spark, Sf0001)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if graft.harness.Recall.cosine(rows(i)._2, rows(j)._2) >= 0.4
    } {
      val (ra, rb) = (find(rows(i)._1), find(rows(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truthKept = rows.map(r => r._1 -> (if (find(r._1) == r._1) 1 else 0)).toMap
    assert(truthKept.valuesIterator.sum < truthKept.size,
      "fixture must contain semantic duplicates to prune")
    def keepers(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    def agreement(got: Map[Long, Int]): Double =
      truthKept.count { case (id, k) => got(id) == k }.toDouble / truthKept.size
    val exactAgree = agreement(keepers(DedupQueries.semanticKeepers(spark, Sf0001)))
    val bucketedAgree = agreement(keepers(DedupQueries.semanticKeepersBucketed(spark, Sf0001)))
    info(s"keeper agreement vs all-pairs truth: label-blocked=$exactAgree ivf-bucketed=$bucketedAgree")
    // measured: the LEARNED blocking nearly matches truth (0.986) while
    // the label-blocked stage caps at 0.878 — label blocking structurally
    // misses every cross-label duplicate, which is exactly why the
    // label-free twin is the deployable one; the blocked stage's value is
    // being DuckDB-oracle-expressible (exact values for its pair set)
    assert(bucketedAgree >= 0.95, "learned blocking should nearly match truth")
    assert(exactAgree >= 0.85)
    assert(bucketedAgree >= exactAgree,
      "the scale path should not be worse than the label-blocked stage here")
  }

  test("embedding near-dup: shuffle-join scale path equals the broadcast path") {
    // broadcastBuild=false is what runs past the broadcast/driver limit —
    // it must produce the identical pair set (values included)
    val emb = VectorModel.embeddings(spark, Sf0001)
    def collectPairs(broadcastBuild: Boolean) =
      Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", "label",
        VectorModel.EmbDim, 0.3, broadcastBuild = broadcastBuild)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .toSet
    assert(collectPairs(broadcastBuild = false) === collectPairs(broadcastBuild = true))
  }

  test("fuzzy parts: banded shuffle join equals the unblocked brute force") {
    import org.apache.spark.sql.functions._
    val p = spark.read.parquet(s"$Sf0001/part.parquet")
      .select("p_partkey", "p_brand", "p_name")
    def triple(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = triple(graft.queries.DedupQueries.fuzzyParts(spark, Sf0001))
    val brute = triple(p.as("a")
      .join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist",
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long"))
      .where(col("dist") <= graft.queries.DedupQueries.FuzzyMaxDist)
      .select(col("a.p_partkey"), col("b.p_partkey"), col("dist")))
    assert(brute.nonEmpty, "fixture must contain fuzzy matches")
    assert(got === brute)
  }

  test("fuzzy parts: no full-table broadcast; the blocked join shuffles") {
    val plan = graft.queries.DedupQueries.fuzzyParts(spark, Sf0001)
      .queryExecution.executedPlan.toString
    // the pair join must be a shuffled equi-join on the blocking keys,
    // never a broadcast of the whole part table as the build side
    assert(!plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(3000))
  }

  test("fuzzy parts: a hot brand is split across band blocks (skew fixture)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one brand holding EVERY row — brand-only blocking would put the
    // whole quadratic in one task. Names of varied length so length-band
    // blocking actually partitions the work.
    val n = 3000
    val rows = (0 until n).map { i =>
      val word = ('a' + i % 17).toChar.toString
      (i.toLong, "HOT", word * (5 + (i % 40)))
    }.toDF("p_partkey", "p_brand", "p_name")
    val pairs = graft.queries.DedupQueries.fuzzyPairs(
      rows, "p_partkey", "p_brand", "p_name")
    // correctness on the skewed fixture vs brute force
    def triple(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = triple(rows.as("a")
      .join(rows.as("b"), col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist",
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long"))
      .where(col("dist") <= graft.queries.DedupQueries.FuzzyMaxDist)
      .select(col("a.p_partkey"), col("b.p_partkey"), col("dist")))
    assert(triple(pairs) === brute)
    // the hot brand spans 44 length bands (lengths 5..44, band width 4),
    // so the largest (brand, band) block carries a bounded share of rows —
    // the per-task quadratic is |block|², not n²
    val blockSizes = rows
      .withColumn("band", floor(length(col("p_name")) /
        (graft.queries.DedupQueries.FuzzyMaxDist + 1)))
      .groupBy("p_brand", "band").count()
      .collect().map(_.getLong(2))
    assert(blockSizes.max <= n / 5,
      s"hot-brand rows must spread over bands, got max block ${blockSizes.max}")
  }

  test("leakproof split: near-dup pairs co-travel, buckets are stable, all splits served") {
    import graft.queries.{DedupQueries, PipelineQueries}
    val out = PipelineQueries.leakproofSplit(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // THE leakage property: both ends of every candidate near-dup pair
    // land in the same split (same component -> same bucket by
    // construction; this asserts it end to end through the layout)
    val pairs = spark.read.parquet(DedupQueries.pairLayout(spark, Sf0001))
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(out(a)._2 === out(b)._2,
        s"near-dup pair ($a, $b) split across ${out(a)._2}/${out(b)._2}")
    }
    // determinism + bucket range + every split non-empty at this corpus
    val again = PipelineQueries.leakproofSplit(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(again === out)
    assert(out.values.forall { case (b, _) => b >= 0 && b < 100 })
    assert(out.values.map(_._2).toSet === Set("train", "val", "test"))
    // proportions track the 90/5/5 design within a loose tolerance
    val frac = out.values.count(_._2 == "train").toDouble / out.size
    assert(frac > 0.8 && frac < 0.98, s"train fraction $frac")
  }

  test("quality keepers: keep the best member, not the smallest id") {
    import org.apache.spark.sql.functions._
    val comp = graft.queries.DedupQueries.components(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.model.VectorModel.documents(spark, Sf0001)
      .select(col("doc_id"),
        round(graft.text.TextAnalysis.qualityScore(col("text")), 6).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keepers = graft.queries.DedupQueries.qualityKeepers(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(keepers.map(_._1).toSeq === comp.values.toSeq.distinct.sorted,
      "one keeper per component")
    keepers.foreach { case (c, keeper, kq, n) =>
      val members = comp.collect { case (d, cc) if cc == c => d }.toSeq
      assert(members.size.toLong === n, s"component $c member count")
      assert(members.contains(keeper), s"keeper $keeper outside component $c")
      assert(kq === quality(keeper))
      assert(members.forall(m => quality(m) <= kq),
        s"component $c keeps $keeper (q=$kq) but a better member exists")
      // deterministic tie: among max-quality members, lowest id wins
      assert(keeper === members.filter(m => quality(m) == kq).min)
    }
    // the refinement matters: some multi-member component's best is NOT
    // its min id (otherwise this operator is the min-id keeper renamed)
    val multi = keepers.filter(_._4 > 1)
    assert(multi.nonEmpty, "fixture must contain multi-member components")
  }
}
