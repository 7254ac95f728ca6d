package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch tool: is the stored-HNSW serve EXACTLY the brute-force
  * top-k on this corpus, at every SF — the empirical question behind
  * converting `vq_hnsw_stored_topk` to a hash gate (round-14 task 8).
  * Run: sbt "Test/runMain graft.DevHnswExact". */
object DevHnswExact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.model.VectorModel
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val stored = graft.queries.ApproxQueries.queries("vq_hnsw_stored_topk")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val brute = graft.search.VectorSearch
        .bruteForceTopK(VectorModel.lineitemVectors(spark, sf), VectorModel.Query, 10)
        .selectExpr("id", "round(sim, 6) AS sim")
        .orderBy(org.apache.spark.sql.functions.col("sim").desc,
          org.apache.spark.sql.functions.col("id").asc)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      println(s"DEVHNSW $sf equal=${stored == brute}")
      if (stored != brute) {
        println(s"  stored=$stored")
        println(s"  brute =$brute")
      }
      // batch twin: per-query stored results vs per-query exact top-3
      val storedB = graft.queries.ApproxQueries.queries("vq_hnsw_stored_batch")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      val qs = VectorModel.partQueries(spark, sf).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
      val bruteB = qs.flatMap { case (qid, q) =>
        graft.search.VectorSearch
          .bruteForceTopK(VectorModel.lineitemVectors(spark, sf), q, 3)
          .selectExpr("id", "round(sim, 6) AS sim")
          .orderBy(org.apache.spark.sql.functions.col("sim").desc,
            org.apache.spark.sql.functions.col("id").asc)
          .collect().zipWithIndex
          .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1L) }
      }.toSeq
      println(s"DEVHNSW $sf batchEqual=${storedB == bruteB} (${storedB.size} rows)")
      if (storedB != bruteB) {
        println(s"  storedB=$storedB")
        println(s"  bruteB =$bruteB")
      }
      // every other spec-gated single-query family member vs the same
      // brute mirror, and the batch twins vs per-query brute
      def top10(name: String): Seq[(Long, Double)] =
        graft.queries.ApproxQueries.queries(name)(spark, sf)
          .select("id", "sim")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      Seq("vq_hnsw_topk", "vq_hnsw_routed_topk", "vq_hnsw_routed_parity").foreach { n =>
        val got = top10(n)
        println(s"DEVHNSW $sf $n equal=${got == brute}")
        if (got != brute) println(s"  got=$got")
      }
      Seq("vq_hnsw_batch_topk", "vq_hnsw_routed_batch").foreach { n =>
        val got = graft.queries.ApproxQueries.queries(n)(spark, sf)
          .select("query_id", "id", "sim", "rn")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
        println(s"DEVHNSW $sf $n batchEqual=${got == bruteB}")
      }
    }
    spark.stop()
  }
}
