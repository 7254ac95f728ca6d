package graft

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch tool: replicates [[graft.queries.PipelineQueries]]'s BPE
  * shard-export body phase by phase (vocab write, pack collect, corpus
  * total, cell write) to attribute build_corpus_shards_bpe's cost.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DevShardPhases". */
object DevShardPhases {

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
    timed("pre: sig+pair+component layouts") {
      graft.queries.DedupQueries.sigLayout(spark, sfDir)
      graft.queries.DedupQueries.pairLayout(spark, sfDir)
      graft.queries.DedupQueries.componentLayout(spark, sfDir)
    }
    import org.apache.spark.sql.expressions.Window
    val model = graft.text.Bpe.FixtureModel
    val root = graft.store.Fs.scratchDir(spark, "dev_shard_phases")
    val input = graft.queries.PipelineQueries.trainCorpus(spark, sfDir)
      .select((col("doc_id") * graft.queries.PipelineQueries.ChunkIdBase
        + col("chunk_ix")).as("doc"), col("chunk").as("txt"))
    val in = timed("cache input (one trainCorpus pass)") {
      val c = graft.store.CacheRegistry.cached(input); c.count(); c
    }
    val exploded = timed("cache exploded (encode pass over cached input)") {
      val e = graft.store.CacheRegistry.cached(
        in.select(col("doc"),
          posexplode(graft.text.Bpe.bpeTokens(col("txt"), model))
            .as(Seq("dpos", "tok"))))
      e.count(); e
    }
    timed("vocab distinct + write") {
      exploded.select("tok").distinct()
        .withColumn("vid",
          row_number().over(Window.orderBy(col("tok"))).cast("int"))
        .write.mode("overwrite").parquet(s"$root/vocab")
    }
    val vocab = spark.read.parquet(s"$root/vocab")
    val cells = exploded
      .join(broadcast(vocab), "tok")
      .select(col("doc"), col("dpos").cast("long").as("dpos"),
        col("vid").as("id"))
    val docs = timed("cache docs (projection of cached input)") {
      val d = graft.store.CacheRegistry.cached(in.select(col("doc")))
      d.count(); d
    }
    val blanks = docs
      .join(exploded.select("doc").distinct(), Seq("doc"), "left_anti")
      .select(col("doc"), lit(0L).as("dpos"),
        lit(graft.operators.TokenShards.PadId).as("id"))
    val counts = docs
      .join(exploded.groupBy("doc").agg(count(lit(1)).as("nb")), Seq("doc"), "left")
      .select(col("doc"),
        greatest(coalesce(col("nb"), lit(0L)), lit(1L)).as("n"))
    timed("writeCells (pack collect + total + window write)") {
      graft.operators.TokenShards.writeCells(counts,
        cells.unionByName(blanks),
        graft.queries.PipelineQueries.PackCap,
        graft.queries.PipelineQueries.PackShards,
        graft.queries.PipelineQueries.TokenShardFiles,
        s"$root/shards")
    }
    spark.stop()
  }
}
