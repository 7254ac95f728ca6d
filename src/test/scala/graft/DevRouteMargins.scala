package graft

import org.apache.spark.sql.SparkSession

import graft.index.{HnswStore, Ivf}
import graft.model.VectorModel

/** Dev probe: per-query sorted centroid cosine-DISTANCE curves on the
  * 64-shard routed layout, plus the rank of every shard holding a true
  * top-k neighbor — the data an adaptive probe rule must be shaped by.
  * Prints one line per query: the first 16 distances and the neighbor
  * shards' ranks. */
object DevRouteMargins {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val vecs = VectorModel.lineitemVectors(spark, sfDir).cache()
    val dir = graft.store.Fs.scratchDir(spark, "graft_margins") + "/g"
    HnswStore.saveRouted(vecs, dir, numShards = 64)
    val cents = HnswStore.readRouting(spark, dir).get
    val queries = (0 until 20).map(s =>
      Seq(25.0 + (s % 10), 30.0, 0.5, 0.5, 0.5, 0.5, 0.5, 1.0 + s))
    // shard of every id (from the layout)
    val shardOf = spark.read.parquet(dir).select("id", "part").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    queries.zipWithIndex.foreach { case (q, qi) =>
      def cos(c: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < c.length) { dot += c(i) * q(i); na += c(i) * c(i); nb += q(i) * q(i); i += 1 }
        if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val ranked = cents.zipWithIndex.map { case (c, i) => (1.0 - cos(c), i) }
        .sortBy(_._1)
      val rankOfShard = ranked.map(_._2).zipWithIndex.toMap
      val truth = graft.search.VectorSearch.bruteForceTopK(vecs, q, 10)
        .select("id").collect().map(_.getLong(0))
      val neighborRanks = truth.flatMap(id => shardOf.get(id))
        .map(rankOfShard).distinct.sorted
      val ds = ranked.take(16).map(d => f"${d._1}%.5f").mkString(",")
      println(s"Q$qi dists=[$ds] neighbor_shard_ranks=${neighborRanks.mkString(",")}")
    }
    spark.stop()
  }
}
