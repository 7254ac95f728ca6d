package graft

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch tool: splits the BPE corpus-shard export (the
  * build_corpus_shards_bpe cost) into its phases — upstream curated-chunk
  * derivation, BPE encode passes, pack prefix-sum actions, and the final
  * window write — to aim optimization at the real cost.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DevShardProfile". */
object DevShardProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .pipe(graft.search.IdFetch.configure)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the upstream layouts the curated pipeline serves from (the
    // bench pre-phase does the same before build_corpus_shards_bpe runs)
    timed("pre: sig+pair+component layouts") {
      graft.queries.DedupQueries.sigLayout(spark, sfDir)
      graft.queries.DedupQueries.pairLayout(spark, sfDir)
      graft.queries.DedupQueries.componentLayout(spark, sfDir)
    }
    val chunks = graft.queries.PipelineQueries.trainCorpus(spark, sfDir)
      .select((col("doc_id") * graft.queries.PipelineQueries.ChunkIdBase + col("chunk_ix")).as("doc"),
        col("chunk").as("txt"))
    timed("chunks.count (one trainCorpus pass)") { chunks.count() }
    timed("chunks.count again") { chunks.count() }
    val model = graft.text.Bpe.FixtureModel
    val counts = chunks.select(col("doc"),
      greatest(graft.text.Bpe.bpeTokenCount(col("txt"), model).cast("long"),
        lit(1L)).as("n"))
    timed("counts agg (trainCorpus + full encode)") {
      counts.agg(sum("n")).head.getLong(0)
    }
    val exploded = chunks.select(col("doc"),
      posexplode(graft.text.Bpe.bpeTokens(col("txt"), model))
        .as(Seq("dpos", "tok")))
    timed("exploded.count (trainCorpus + full encode + explode)") {
      exploded.count()
    }
    timed("full bpeShardLayout (the bench build step)") {
      graft.queries.PipelineQueries.corpusShardBpeLayout(spark, sfDir)
    }
    spark.stop()
  }
}
