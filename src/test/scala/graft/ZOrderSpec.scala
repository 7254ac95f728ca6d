package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering ([[graft.operators.ZOrder]]): the Morton bit math,
  * content preservation, and the data-skipping property itself — a
  * predicate on the SECOND key prunes most z-clustered files on footer
  * stats where a lexicographic sort prunes none. The box aggregate's
  * values are the driver's DuckDB gate (`q_zorder_box`). */
class ZOrderSpec extends SparkSpec {

  test("interleave is the Morton number on hand-checked bit patterns") {
    def z(a: Long, b: Long, bits: Int = 8): Long =
      spark.range(1).select(lit(a).as("a"), lit(b).as("b"))
        .select(ZOrder.interleave("a", "b", bits)).collect()(0).getLong(0)
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L) // a bit 0 -> position 0
    assert(z(0L, 1L) == 2L) // b bit 0 -> position 1
    assert(z(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(z(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(z(3L, 3L) == 15L)
    assert(z(255L, 0L) == 0x5555L)
    // adjacency: consecutive a at fixed b differ in interleaved low bits
    assert(z(5L, 9L) == (z(4L, 9L) ^ 1L))
  }

  test("clustering preserves content exactly") {
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val p = graft.store.Fs.scratchDir(spark, "zorder_spec") + "/li"
    ZOrder.writeClustered(li, p, "l_partkey", "l_suppkey", bits = 16, numFiles = 8)
    val back = spark.read.parquet(p)
    assert(back.schema.fieldNames.sorted.toSeq == li.schema.fieldNames.sorted.toSeq)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_partkey"), sum("l_suppkey"), sum("l_orderkey")).collect()(0) ==
      li.agg(sum("l_partkey"), sum("l_suppkey"), sum("l_orderkey")).collect()(0))
  }

  test("a second-key predicate prunes z files; a lexicographic sort prunes none") {
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
    val dir = graft.store.Fs.scratchDir(spark, "zorder_prune")
    val nFiles = 16
    ZOrder.writeClustered(li, s"$dir/z", "l_partkey", "l_suppkey",
      bits = 16, numFiles = nFiles)
    // the baseline every warehouse ships: sort by the leading key
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lex")
    // suppkey <= 10 at sf0.01 (domain 1..100): the second key alone
    val (lo, hi) = (1L, 10L)
    def intersectFraction(path: String): Double = {
      val stats = ZOrder.fileStats(spark.read.parquet(path),
        Seq("l_suppkey")).collect()
      val n = stats.count { r =>
        r.getLong(1) <= hi && r.getLong(2) >= lo // [min,max] overlaps [lo,hi]
      }
      n.toDouble / stats.length
    }
    val zFrac = intersectFraction(s"$dir/z")
    val lexFrac = intersectFraction(s"$dir/lex")
    assert(lexFrac == 1.0,
      s"lexicographic files should all span the suppkey domain, got $lexFrac")
    assert(zFrac <= 0.5, s"z-clustered intersect fraction $zFrac > 0.5")
  }
}
