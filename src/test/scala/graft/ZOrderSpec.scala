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

  test("N-column interleave places bit i of column j at position n*i+j") {
    def z(vals: Long*): Long = {
      val cols = vals.indices.map(j => s"c$j")
      val df = spark.range(1).select(
        vals.zipWithIndex.map { case (v, j) => lit(v).as(s"c$j") }: _*)
      // identity normalization: domain [0, 2^bits-1]
      df.select(ZOrder.interleaveNormalized(cols, 4,
        cols.map(_ => 0L), cols.map(_ => 15L))).collect()(0).getLong(0)
    }
    assert(z(1L, 0L, 0L) == 1L) // c0 bit 0 -> position 0
    assert(z(0L, 1L, 0L) == 2L) // c1 bit 0 -> position 1
    assert(z(0L, 0L, 1L) == 4L) // c2 bit 0 -> position 2
    assert(z(2L, 0L, 0L) == 8L) // c0 bit 1 -> position 3
    assert(z(1L, 1L, 1L) == 7L)
    // full-pattern check: c0=0b1111, c2=0b1111 -> bits at positions 0 and
    // 2 of every triple: 0b101101101101
    assert(z(15L, 0L, 15L) == java.lang.Long.parseLong("101101101101", 2))
  }

  test("three-column z-clustering: every single-key box prunes files") {
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
    val dir = graft.store.Fs.scratchDir(spark, "zorder3_prune")
    val nFiles = 16
    ZOrder.writeClustered(li, s"$dir/z3",
      Seq("l_partkey", "l_suppkey", "l_orderkey"), bits = 12, numFiles = nFiles)
    val back = spark.read.parquet(s"$dir/z3")
    assert(back.count() == li.count())
    def fracOverlapping(keyCol: String, loFrac: Double, hiFrac: Double): Double = {
      val mm = li.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long")).head
      val (mn, mx) = (mm.getLong(0), mm.getLong(1))
      val lo = mn + ((mx - mn) * loFrac).toLong
      val hi = mn + ((mx - mn) * hiFrac).toLong
      val stats = ZOrder.fileStats(back, Seq(keyCol)).collect()
      stats.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo).toDouble / stats.length
    }
    // a 10%-of-domain box on EACH key alone must prune files — the
    // property a 2-column curve can only give two of the three keys
    val fracs = Seq("l_partkey", "l_suppkey", "l_orderkey")
      .map(k => k -> fracOverlapping(k, 0.0, 0.1))
    fracs.foreach { case (k, f) => info(s"$k 10%-box file fraction: $f") }
    fracs.foreach { case (k, f) =>
      assert(f <= 0.7, s"$k 10%-box should prune files, got $f")
    }
  }

  test("null keys and oversized spans fail loudly") {
    import spark.implicits._
    val dir = graft.store.Fs.scratchDir(spark, "zorder_guard")
    val withNull = Seq((1L, Some(2L)), (2L, None), (3L, Some(4L)))
      .toDF("a", "b")
    val eNull = intercept[IllegalArgumentException] {
      ZOrder.writeClustered(withNull, s"$dir/n", "a", "b", 8, 2)
    }
    assert(eNull.getMessage.contains("null"))
    val eSpan = intercept[IllegalArgumentException] {
      ZOrder.interleaveNormalized(Seq("a", "b"), 20,
        Seq(0L, 0L), Seq(Long.MaxValue - 1, 15L))
    }
    assert(eSpan.getMessage.contains("span"))
    val eBits = intercept[IllegalArgumentException] {
      ZOrder.interleaveNormalized(Seq("a", "b", "c"), 21,
        Seq(0L, 0L, 0L), Seq(1L, 1L, 1L))
    }
    assert(eBits.getMessage.contains("positions"))
  }

  test("VectorDb z-order layout: appends decay pruning, maintenance restores it") {
    val db = new graft.api.VectorDb(spark, dim = 2)
    def rows(n: Int, off: Int) = (0 until n).map { i =>
      val x = (i * 37 + off) % 1000
      val y = (i * 61 + off * 7) % 1000
      (Seq(1.0, 0.0), Map("x" -> x.toString, "y" -> y.toString))
    }
    db.batchInsert(rows(1500, 0))
    db.buildZOrderLayout(Seq("x", "y"), bits = 12, numFiles = 8)
    def layoutBoxFraction(): Double = {
      val scan = db.zorderScan()
      val stats = ZOrder.fileStats(scan.where(lit(true)), Seq("zk_y")).collect()
      stats.count(r => r.getLong(1) <= 100L && r.getLong(2) >= 0L)
        .toDouble / stats.length
    }
    val before = layoutBoxFraction()
    assert(before < 1.0, s"fresh layout should prune on zk_y, got $before")
    assert(db.zorderScan().count() == 1500L)
    // heavy append: delta rows arrive unclustered — the union still serves
    // every row, but delta files span the whole domain
    db.batchInsert(rows(1200, 13))
    assert(db.zorderScan().count() == 2700L)
    val decayed = layoutBoxFraction()
    assert(decayed > before,
      s"append should decay the box fraction: $before -> $decayed")
    val actions = db.maintainIndexes(maxDeltaFraction = 0.2)
    assert(actions.contains("zorder_reclustered"), actions.toString)
    assert(db.zorderScan().count() == 2700L)
    val restored = layoutBoxFraction()
    assert(restored <= before + 0.25,
      s"re-cluster should restore pruning: before=$before restored=$restored")
    assert(db.describeIndexes().where(col("family") === "zorder")
      .select("covered_up_to").head.getLong(0) == 2700L)
  }
}
