package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.LshAnn
import graft.model.VectorModel
import graft.search.VectorSearch

/** Measure the fresh single-table sign-LSH base operating point at probe
  * radius 1 vs 2 — recall@10 and scanned fraction over the RecallBench
  * query set (the `lsh_recall` line's harness shape).
  *
  * `Test/runMain graft.DevLshBase <sfDir>`
  */
object DevLshBase {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = VectorModel.embeddings(spark, dir).cache()
    val n = data.count()
    val dim = VectorModel.EmbDim
    val k = 10
    val queries = (0 until 20).map(s => VectorModel.syntheticQuery(s))
    val planes = LshAnn.hyperplanes(numBits = 4, dim = dim)
    val bucketed = LshAnn.withBuckets(data, "embedding", planes).cache()
    bucketed.count()
    val sizes = bucketed.groupBy("lsh_bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Seq(1, 2).foreach { radius =>
      val recalls = queries.map { q =>
        val exact = VectorSearch.bruteForceTopK(data, q, k,
          vecCol = "embedding", idCol = "vec_id")
        val approx = LshAnn.search(bucketed, planes, q, k,
          vecCol = "embedding", idCol = "vec_id", radius = radius)
        graft.harness.Recall.recallAtK(exact, approx, "vec_id")
      }
      val scanned = queries.map(q =>
        LshAnn.probeBuckets(q, planes, radius)
          .map(sizes.getOrElse(_, 0L)).sum.toDouble / n)
      println(f"DEVLSH radius=$radius recall=${recalls.sum / recalls.size}%.4f " +
        f"scanned=${scanned.sum / scanned.size}%.4f")
    }
    spark.stop()
  }
}
