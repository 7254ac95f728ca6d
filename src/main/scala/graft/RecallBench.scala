package graft

import org.apache.spark.sql.SparkSession

import graft.harness.Recall
import graft.index.{Hnsw, Ivf, IvfPq, LshAnn}
import graft.model.VectorModel
import graft.search.VectorSearch

/** H2 recall/latency comparison harness — the reference's own measurement
  * protocol (examples/datawhale.py:151-232): a query set, recall@k of each
  * approximate method vs the exact operator, and mean ms/query per method.
  * Prints one JSON line.
  *
  * Usage: runMain graft.RecallBench [sfDir] [numQueries] [k]
  */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val numQueries = if (args.length > 1) args(1).toInt else 20
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.functions.col
    val data = VectorModel.embeddings(spark, sfDir)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .cache()
    data.count()
    val dim = VectorModel.EmbDim
    val queries = (0 until numQueries).map { s =>
      (0 until dim).map(i => ((i * 31 + s * 17 + 7) % 97) / 97.0)
    }

    // one-time index builds (amortized across the query set, as the
    // reference's harness does)
    val (ivfAssigned, ivfModel) = Ivf.fit(data, vecCol = "embedding", idCol = "vec_id")
    ivfAssigned.cache().count()
    val planes = LshAnn.hyperplanes(numBits = 4, dim = dim)
    val lshBucketed = LshAnn.withBuckets(data, "embedding", planes).cache()
    lshBucketed.count()

    def timeAll(run: Seq[Double] => org.apache.spark.sql.DataFrame)
        : (Double, Seq[Set[Long]]) = {
      val t0 = System.nanoTime()
      val results = queries.map(q => run(q).collect().map(_.getLong(0)).toSet)
      (((System.nanoTime() - t0) / 1e6) / numQueries, results)
    }

    val (bruteMs, exact) = timeAll(q =>
      VectorSearch.bruteForceTopK(data, q, k, vecCol = "embedding", idCol = "vec_id")
        .select("vec_id"))
    val (ivfMs, ivfRes) = timeAll(q =>
      Ivf.search(ivfAssigned, ivfModel, q, k, vecCol = "embedding", idCol = "vec_id")
        .select("vec_id"))
    // batch HNSW: per-partition graphs built once for the whole query set
    val (hnswMs, hnswRes) = {
      val t0 = System.nanoTime()
      val all = Hnsw.hnswBatchTopK(data, queries.zipWithIndex.map { case (q, i) => (i.toLong, q) },
        k, numPartitions = 8, vecCol = "embedding", idCol = "vec_id")
        .select("query_id", "vec_id").collect()
      val byQ = all.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
      val res = (0 until numQueries).map(i => byQ.getOrElse(i.toLong, Set.empty[Long]))
      (((System.nanoTime() - t0) / 1e6) / numQueries, res)
    }
    val (lshMs, lshRes) = timeAll(q =>
      LshAnn.search(lshBucketed, planes, q, k, vecCol = "embedding", idCol = "vec_id")
        .select("vec_id"))
    // IVF-PQ: residual codes + ADC + exact refine (build amortized)
    val (ivfPqEncoded, ivfPqModel) = IvfPq.build(data, dim,
      vecCol = "embedding", idCol = "vec_id")
    ivfPqEncoded.cache().count()
    val (ivfPqMs, ivfPqRes) = timeAll(q =>
      IvfPq.search(ivfPqEncoded, ivfPqModel, q, k,
        refineFrom = Some(data), vecCol = "embedding", idCol = "vec_id")
        .select("vec_id"))

    def recall(approx: Seq[Set[Long]]): Double =
      exact.zip(approx).map { case (e, a) =>
        if (e.isEmpty) 1.0 else e.intersect(a).size.toDouble / e.size
      }.sum / exact.size

    val json =
      f"""{"queries":$numQueries,"k":$k,"sf":"$sfDir",""" +
        f""""brute_ms":$bruteMs%.2f,""" +
        f""""ivf_ms":$ivfMs%.2f,"ivf_recall":${recall(ivfRes)}%.4f,""" +
        f""""hnsw_ms":$hnswMs%.2f,"hnsw_recall":${recall(hnswRes)}%.4f,""" +
        f""""lsh_ms":$lshMs%.2f,"lsh_recall":${recall(lshRes)}%.4f,""" +
        f""""ivfpq_ms":$ivfPqMs%.2f,"ivfpq_recall":${recall(ivfPqRes)}%.4f}"""
    println(json)
    spark.stop()
  }
}
