package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column data-skipping
  * layout (Delta's OPTIMIZE ZORDER, Hudi/Iceberg equivalents): interleave
  * the bits of two key columns and range-partition + sort the table by the
  * interleaved value, so every output FILE covers a compact box in
  * (a, b) space and a two-dimensional box predicate prunes most files via
  * plain parquet min/max statistics — no index structure, no query-side
  * cooperation beyond pushed filters.
  *
  * Why not just sort by (a, b)? Lexicographic order localizes a but
  * scatters b: every file spans b's whole domain, so a predicate on b
  * alone (or a 2D box) skips nothing. The Morton curve localizes BOTH —
  * a file of consecutive z values is a small (a, b) rectangle stack —
  * which is exactly what file/row-group stats pruning needs. ZOrderSpec
  * measures the difference on real footuments-style stats.
  *
  * The interleave is a fixed-width bit expression (codegen'd, no UDF);
  * sums of disjoint bit positions compose the word, the
  * [[graft.pq.BinaryQuantizer]] packing argument. */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns (by name): bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. `bits` ≤ 31 keeps every term and the sum inside a positive
    * BIGINT. */
  def interleave(a: String, b: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorder: bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(shiftleft(shiftright(CAST(`$a` AS BIGINT), $i) & 1, ${2 * i}))",
        s"(shiftleft(shiftright(CAST(`$b` AS BIGINT), $i) & 1, ${2 * i + 1}))")
    }
    expr(terms.mkString(" + "))
  }

  /** Min/max-normalized Morton key: each column rescales to the FULL
    * `bits`-wide range before interleaving. Raw interleaving of
    * unequal-width domains degenerates — the wider key's high bits occupy
    * all the top z positions, so the curve sorts by that key alone and
    * the narrow key never localizes (ZOrderSpec's pruning test CAUGHT
    * exactly this with partkey's 11 bits vs suppkey's 7: every file
    * spanned the whole suppkey domain). Normalization is the standard
    * production fix. Integer arithmetic throughout: (v−min)·(2^bits−1)
    * div (max−min), exact in BIGINT for bits ≤ 20 and 32-bit key spans. */
  def interleaveNormalized(a: String, b: String, bits: Int,
      minA: Long, maxA: Long, minB: Long, maxB: Long): Column = {
    // bits ≤ 20: positions stay ≤ 41 and (span ≤ 2^32)·(2^bits−1) stays
    // well inside positive BIGINT — larger values would silently wrap
    // into the sign bit and destroy the clustering order
    require(bits >= 1 && bits <= 20, s"zorder: bits must be in [1,20], got $bits")
    val top = (1L << bits) - 1
    def norm(c: String, mn: Long, mx: Long): String =
      if (mx <= mn) "CAST(0 AS BIGINT)"
      else s"((CAST(`$c` AS BIGINT) - ${mn}L) * ${top}L div ${mx - mn}L)"
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"(shiftleft(shiftright(${norm(a, minA, maxA)}, $i) & 1, ${2 * i}))",
        s"(shiftleft(shiftright(${norm(b, minB, maxB)}, $i) & 1, ${2 * i + 1}))")
    }
    expr(terms.mkString(" + "))
  }

  /** Write `df` z-clustered by (`colA`, `colB`): one min/max aggregate to
    * normalize the key domains, range-partition on the interleaved key
    * into `numFiles` tasks, sort within each, write parquet. Range
    * partitioning samples the key distribution, so files get contiguous z
    * ranges — compact (a, b) boxes — regardless of skew. */
  def writeClustered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, numFiles: Int): Unit = {
    val r = df.agg(min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    require(!r.isNullAt(0), s"zorder: no rows to cluster (empty input for $path)")
    df.withColumn("__z", interleaveNormalized(colA, colB, bits,
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) stats of a column over a written layout — the
    * statistics a stats-pruning reader consults, surfaced for
    * measurement: one scan, grouped by file. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(min(cols.head).as(s"min_${cols.head}"),
        (Seq(max(col(cols.head)).as(s"max_${cols.head}")) ++
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))): _*)
}
