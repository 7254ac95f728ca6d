package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: Ivf.fit cost at 8-d (lineitem vectors) and 64-d
  * (embeddings) — the sample-collect strategy comparison. */
object DevFitProfile {
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
    val vecs = graft.model.VectorModel.lineitemVectors(spark, sfDir)
    val emb = graft.model.VectorModel.embeddings(spark, sfDir)
    timed("warm: vecs count") { vecs.count() }
    timed("warm: emb count") { emb.count() }
    (1 to 2).foreach { i =>
      timed(s"fit 8d k=16 rep$i") { graft.index.Ivf.fit(vecs) }
      timed(s"fit 8d k=64 rep$i") { graft.index.Ivf.fit(vecs, k = 64) }
      timed(s"fit 64d k=16 rep$i") {
        graft.index.Ivf.fit(emb, "embedding", idCol = "vec_id")
      }
    }
    spark.stop()
  }
}
