package graft

import scala.util.chaining._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: splits the stored-HNSW serve (vq_hnsw_stored_topk shape)
  * into scan/decode vs restore vs search, to decide whether the layout
  * row format is worth changing.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DevHnswServeProfile". */
object DevHnswServeProfile {

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
    val p = graft.store.Fs.scratchDir(spark, "hnsw_serve_prof")
    timed("build+save") {
      graft.index.HnswStore.save(
        graft.model.VectorModel.lineitemVectors(spark, sfDir), s"$p/g")
    }
    (1 to 3).foreach { i =>
      timed(s"scan only (count rows) rep$i") {
        spark.read.parquet(s"$p/g").count()
      }
      timed(s"scan+decode to Rec (foreach noop) rep$i") {
        import spark.implicits._
        spark.read.parquet(s"$p/g")
          .select(col("part").cast("int"), col("ord").cast("int"),
            col("id").cast("long"), col("vector").cast("array<double>"),
            col("node_level").cast("int"), col("adj").cast("array<array<bigint>>"),
            col("is_entry"), col("part_rows").cast("int"))
          .as[(Int, Int, Long, Array[Double], Int, Array[Array[Long]], Boolean, Int)]
          .mapPartitions(it => Iterator.single(it.size))
          .collect()
      }
      timed(s"full serve topK rep$i") {
        graft.index.HnswStore.topK(spark, s"$p/g",
          graft.model.VectorModel.Query, 10).count()
      }
      timed(s"driver: readMeta rep$i") {
        graft.index.HnswStore.readMeta(spark, s"$p/g")
      }
      timed(s"restore all graphs in-task (no search) rep$i") {
        import spark.implicits._
        val recs = spark.read.parquet(s"$p/g")
          .select(col("part").cast("int"), col("ord").cast("int"),
            col("id").cast("long"), col("vector").cast("array<double>"),
            col("node_level").cast("int"), col("adj").cast("array<array<bigint>>"),
            col("is_entry"), col("part_rows").cast("int"))
          .as[(Int, Int, Long, Array[Double], Int, Array[Array[Long]], Boolean, Int)]
        recs.mapPartitions { rows =>
          val bys = rows.toSeq.groupBy(_._1)
          bys.iterator.map { case (part, grp) =>
            val idx = graft.index.HnswIndex.restore(
              grp.sortBy(_._2).map { case (_, _, id, vec, level, adj, isEntry, _) =>
                (id, vec, level, adj, isEntry) }, 16, 64)
            idx.size
          }
        }.collect().sum
      }
    }
    spark.stop()
  }
}
