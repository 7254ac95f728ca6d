package graft

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1 dataset one decade above the largest driver-provided
  * scale factor, for exponent validation of the cross-SF sweep
  * (`Test/runMain graft.DevScaleUp <sf0.1 dir> <out dir>`):
  * ten id-shifted copies of sf0.1, STRUCTURE-PRESERVING per copy and
  * disjoint across copies — the shape a real 10× corpus has, which plain
  * replication does not (identical text across copies would merge dup
  * groups 10-fold and inflate the pair-quadratic terms 100×, measuring
  * the synthesis instead of the operator).
  *
  *  - documents: copy 0 verbatim; copy i renames every token EXCEPT the
  *    langid/stopword markers ([[graft.text.TextAnalysis.LangMarkers]])
  *    to a SAME-LENGTH md5-derived token (`md5(token ~ i)` hex, cut to
  *    the token's length) — so within-copy shingle/near-dup structure is
  *    isomorphic to the original (the rename is deterministic and
  *    injective up to hex collisions, which need a full shingle of
  *    simultaneous short-token collisions to matter), cross-copy shingle
  *    sets are disjoint (df per shingle unchanged, Σdf² scales ×10
  *    exactly), and content gates score each copy identically: a
  *    suffixing rename would shift mean token length and flip
  *    gopher-style length gates near their thresholds — length
  *    preservation keeps every stopword-ratio/langid/length statistic
  *    bit-identical per copy.
  *  - embeddings: vec_id shifted; coordinate 0 nudged by i·10⁻³ so copies
  *    are not exact ties.
  *  - lineitem: l_orderkey shifted (the vector-id packing stays bijective
  *    because the other packed columns keep their ranges).
  *  - part: verbatim (query-vector source only; queries must not scale).
  *
  * Content-MODEL gates (quality logistic, LM perplexity, DSIR) retrain on
  * the suffixed corpus and may pick different fractions — entries whose
  * cost is gated row counts rather than scan/shuffle structure are
  * excluded from the sf1 spot list for that reason (SCALE.md). */
object DevScaleUp {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val in = args(0); val out = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("DevScaleUp")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .pipe(graft.search.IdFetch.configure)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val preserved = graft.text.TextAnalysis.LangMarkers.flatMap(_._2) :+ ""

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(i => shift(df, i)).reduce(_ unionByName _)

    // documents: token-suffixed copies, marker tokens preserved
    val docs = spark.read.parquet(s"$in/documents.parquet")
    val docStride = nextStride(docs.agg(max("doc_id")).head.getLong(0))
    // repeat count scaled from the CORPUS max token length (md5 hex is 32
    // chars per repeat): a fixed repeat(…, 8) caps the pool at 256 chars
    // and would silently TRUNCATE any longer token, breaking the
    // length-preservation invariant every bit-identical statistic below
    // rests on — one aggregate, driver-side, before the rename
    val maxTokLen = docs
      .agg(max(array_max(transform(split(col("text"), " "), t => length(t)))))
      .head.getInt(0)
    val md5Repeats = math.max(1, (maxTokLen + 31) / 32)
    copies(docs) { (df, i) =>
      if (i == 0) df
      else {
        // same-length rename: md5 hex repeated past any token length,
        // cut to the original length — n_chars and every per-token
        // length statistic survive bit-identical
        val renamed = transform(split(col("text"), " "),
          t => when(t.isin(preserved: _*), t)
            .otherwise(repeat(md5(concat(t, lit(s"~$i"))), md5Repeats)
              .substr(lit(1), length(t))))
        df.select(
          (col("doc_id") + lit(i * docStride)).as("doc_id"),
          array_join(renamed, " ").as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    // embeddings: shifted ids, tie-breaking nudge on coordinate 0
    val emb = spark.read.parquet(s"$in/embeddings.parquet")
    val embStride = nextStride(emb.agg(max("vec_id")).head.getLong(0))
    val embCols = emb.columns
    copies(emb) { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("vec_id", col("vec_id") + lit(i * embStride))
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            when(j === 0, x + lit(i * 1e-3f)).otherwise(x)))
        .select(embCols.map(col): _*)
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // lineitem: shifted order keys (vector ids stay bijective)
    val li = spark.read.parquet(s"$in/lineitem.parquet")
    val liStride = nextStride(li.agg(max("l_orderkey")).head.getLong(0))
    val liCols = li.columns
    copies(li) { (df, i) =>
      if (i == 0) df
      else df.withColumn("l_orderkey", col("l_orderkey") + lit(i * liStride))
        .select(liCols.map(col): _*)
    }.repartition(32).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")

    // part: verbatim — the batch-query source, must NOT scale
    spark.read.parquet(s"$in/part.parquet")
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    Seq("documents", "embeddings", "lineitem", "part").foreach { t =>
      println(s"SCALEUP $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }

  /** Smallest power of ten strictly above `maxId` — human-readable shifted
    * id spaces, disjoint by construction. */
  private def nextStride(maxId: Long): Long = {
    var s = 10L
    while (s <= maxId) s *= 10
    s
  }
}
