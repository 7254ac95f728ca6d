package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: cost split of the semantic CC builds (pair discovery vs
  * the contraction loop) and the text-side component layout. */
object DevCcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.model.VectorModel.embeddings(spark, sfDir)
    timed("emb.count") { emb.count() }
    val pairs = timed("exact pair discovery (embeddingNearDupPairs)") {
      val p = graft.dedup.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        "label", graft.model.VectorModel.EmbDim, 0.4, broadcastBuild = false)
        .select(col("da"), col("db"))
      p.cache().count()
      p
    }
    val pp = graft.store.Fs.scratchDir(spark, "cc_prof") + "/pairs"
    timed("write pairs") { pairs.write.mode("overwrite").parquet(pp) }
    timed("connectedComponents (loop only)") {
      graft.dedup.Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id",
        spark.read.parquet(pp)).count()
    }
    timed("connectedComponents rep2") {
      graft.dedup.Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id",
        spark.read.parquet(pp)).count()
    }
    spark.stop()
  }
}
