package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch tool: splits build_ivf_layout wall time into fit (sample +
  * Lloyd) vs assign+clustered-write, to aim optimization at the real cost.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.DevIvfProfile". */
object DevIvfProfile {

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
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val vecs = graft.model.VectorModel.lineitemVectors(spark, sfDir)
    timed("count (scan only)") { vecs.count() }
    val (assigned, model) = timed("Ivf.fit (sample + Lloyd, lazy assign)") {
      graft.index.Ivf.fit(vecs)
    }
    val path = graft.store.Fs.scratchDir(spark, "ivf_prof")
    timed("assign + saveClustered (shuffle + partitioned write)") {
      graft.index.Ivf.saveClustered(assigned, path)
    }
    val path2 = graft.store.Fs.scratchDir(spark, "ivf_prof2")
    timed("assign (no widen) + saveClustered") {
      graft.index.Ivf.saveClustered(graft.index.Ivf.assign(vecs, model), path2)
    }
    spark.stop()
  }
}
