package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cycle count of [[graft.dedup.Dedup.connectedComponents]] on a
  * pure chain with ids ordered along it — the adversarial shape for
  * min-based contraction (every vertex's min neighbor is one hop away, so
  * an unclosed relabeling contracts by ONE per cycle). Run with
  * GRAFT_CC_DEBUG=1 to see per-cycle remaining-edge counts; the
  * pointer-doubled closure should collapse a 2000-chain in one cycle. */
object DevCcChain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 2000L
    val verts = spark.range(n).select(col("id").as("vec_id"))
    val edges = spark.range(n - 1).select(col("id").as("da"), (col("id") + 1).as("db"))
    val t0 = System.nanoTime()
    val cc = graft.dedup.Dedup.connectedComponents(verts, "vec_id", edges)
    val distinct = cc.select("component").distinct().count()
    Console.err.println(
      s"CHAIN n=$n components=$distinct wall=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
