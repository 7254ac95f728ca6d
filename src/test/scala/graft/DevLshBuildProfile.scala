package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: phase split of build_lsh_layout (mean pass, layout write,
  * serve-frame listing, sizes aggregate). */
object DevLshBuildProfile {
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
    val p = graft.store.Fs.scratchDir(spark, "lsh_build_prof")
    val model = timed("saveBucketed (mean + write)") {
      graft.index.LshAnn.saveBucketed(emb, "embedding", "vec_id", s"$p/t",
        graft.model.VectorModel.EmbDim)
    }
    val frame = timed("read frame (partition dir listing)") {
      spark.read.parquet(s"$p/t")
    }
    timed("bucketSizes aggregate") {
      graft.index.LshAnn.bucketSizes(frame)
    }
    timed("read frame again") { spark.read.parquet(s"$p/t").count() }
    spark.stop()
  }
}
