package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW persistence — the reference pickles its graph on `save`
  * (vervectordb/__init__.py:556-573); here each per-partition graph is
  * dumped as parquet adjacency rows (partition, insertion order, id,
  * vector, node level, per-level neighbor ids, entry flag) and restored
  * structurally in O(nodes + edges) — no reconstruction beam search. The
  * build-once/serve-many lifecycle for the graph index, mirroring
  * [[Ivf.saveClustered]] for the inverted-file index.
  *
  * The dump preserves the exact graphs [[Hnsw.hnswTopK]] would build
  * (same deterministic repartition + per-partition seed), so searches over
  * the restored index return identical results to a fresh build.
  */
object HnswStore {

  /** Build per-partition graphs (identically to [[Hnsw.hnswTopK]]) and
    * persist their structure, clustered one file per graph partition. */
  def save(df: DataFrame, path: String,
      m: Int = 16, efConstruction: Int = 64, numPartitions: Int = 32,
      vecCol: String = "vector", idCol: String = "id"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .repartition(numPartitions, col(idCol))
      .sortWithinPartitions(idCol)
    prepared
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val part = TaskContext.getPartitionId()
        val index = new HnswIndex(m, efConstruction, seed = 42L + part)
        rows.foreach { case (id, vec) => index.insert(id, vec) }
        index.dump().zipWithIndex.map { case ((id, vec, level, adj, isEntry), ord) =>
          (part, ord, id, vec, level, adj, isEntry)
        }
      }
      .toDF("part", "ord", "id", "vector", "node_level", "adj", "is_entry")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(path)
  }

  /** Approximate top-k over the persisted graphs: restore each partition's
    * graph from its rows, search, merge globally. */
  def topK(spark: SparkSession, path: String, query: Seq[Double], k: Int,
      m: Int = 16, efConstruction: Int = 64, efSearch: Int = 128,
      idCol: String = "id"): DataFrame = {
    import spark.implicits._
    val q = query.toArray
    val stored = spark.read.parquet(path)
      .select(col("part").cast("int"), col("ord").cast("int"),
        col("id").cast("long"), col("vector").cast("array<double>"),
        col("node_level").cast("int"), col("adj").cast("array<array<bigint>>"),
        col("is_entry"))
      .as[(Int, Int, Long, Array[Double], Int, Array[Array[Long]], Boolean)]
    val perPartition = stored
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toSeq.sortBy(_._2)
        val index = HnswIndex.restore(
          sorted.map { case (_, _, id, vec, level, adj, isEntry) =>
            (id, vec, level, adj, isEntry)
          }, m, efConstruction)
        index.search(q, k, efSearch).iterator
      }
      .toDF(idCol, "sim")
    perPartition
      .withColumn("sim", round(col("sim"), 6))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
