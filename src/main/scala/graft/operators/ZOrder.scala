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

  /** Min/max-normalized N-column Morton key: each column rescales to the
    * FULL `bits`-wide range before interleaving (bit i of column j lands
    * at position n·i + j). Raw interleaving of unequal-width domains
    * degenerates — the widest key's high bits occupy all the top z
    * positions, so the curve sorts by that key alone and the narrow keys
    * never localize (ZOrderSpec's pruning test CAUGHT exactly this with
    * partkey's 11 bits vs suppkey's 7: every file spanned the whole
    * suppkey domain). Normalization is the standard production fix.
    * Integer arithmetic throughout: (v−min)·(2^bits−1) div (max−min) —
    * the span guard below makes an overflowing domain fail LOUDLY instead
    * of silently wrapping into the sign bit and destroying the clustering
    * order. Key columns must be non-null ([[writeClustered]] enforces). */
  def interleaveNormalized(cols: Seq[String], bits: Int,
      mins: Seq[Long], maxs: Seq[Long]): Column = {
    val n = cols.length
    require(n >= 2, s"zorder: need at least 2 key columns, got $n")
    require(mins.length == n && maxs.length == n,
      "zorder: mins/maxs must align with cols")
    // every interleaved position n·i + j must stay inside a positive BIGINT
    require(bits >= 1 && n * bits <= 62,
      s"zorder: $n columns x $bits bits = ${n * bits} positions > 62")
    val top = (1L << bits) - 1
    cols.indices.foreach { j =>
      val span = maxs(j) - mins(j)
      // a full-64-bit domain wraps the span negative — fail loudly
      // instead of normalizing by a negative divisor
      require(span >= 0,
        s"zorder: key domain of ${cols(j)} spans more than a signed " +
          "BIGINT (max - min overflows) — pre-bucket the column")
      require(span <= Long.MaxValue / top,
        s"zorder: key span of ${cols(j)} ($span) overflows the " +
          s"normalization product at bits=$bits — reduce bits or " +
          "pre-bucket the column")
    }
    def norm(j: Int): String =
      if (maxs(j) <= mins(j)) "CAST(0 AS BIGINT)"
      else s"((CAST(`${cols(j)}` AS BIGINT) - ${mins(j)}L) * ${top}L div ${maxs(j) - mins(j)}L)"
    val terms = (0 until bits).flatMap { i =>
      cols.indices.map(j =>
        s"(shiftleft(shiftright(${norm(j)}, $i) & 1, ${n * i + j}))")
    }
    expr(terms.mkString(" + "))
  }

  /** Two-column [[interleaveNormalized]] (bit i of `a` → position 2i, of
    * `b` → 2i+1 — the N=2 case, byte-identical key to the original
    * two-column operator). */
  def interleaveNormalized(a: String, b: String, bits: Int,
      minA: Long, maxA: Long, minB: Long, maxB: Long): Column =
    interleaveNormalized(Seq(a, b), bits, Seq(minA, minB), Seq(maxA, maxB))

  /** Write `df` z-clustered by `cols`: one aggregate for the key domains
    * AND the null-key guard, range-partition on the interleaved key into
    * `numFiles` tasks, sort within each, write parquet. Range partitioning
    * samples the key distribution, so files get contiguous z ranges —
    * compact N-dimensional boxes — regardless of skew. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int, numFiles: Int): Unit = {
    // null count over the CAST value (the space the Morton key is built
    // in): a non-numeric string casts to NULL without being null itself
    // and would otherwise slip past the guard into an arbitrary cluster
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")), max(col(c).cast("long")),
      sum(when(col(c).cast("long").isNull, 1L).otherwise(0L))))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.indices.foreach { j =>
      // a null min/max means an empty input or an all-null key column; a
      // positive null count means null-key rows that would get a null __z
      // and cluster arbitrarily — both violate the non-null-key
      // precondition, fail loudly instead
      require(!r.isNullAt(3 * j) && !r.isNullAt(3 * j + 1),
        s"zorder: cannot cluster $path — key column ${cols(j)} has no " +
          "non-null values (empty input or all-null key); z-order key " +
          "columns must be non-null")
      require(r.getLong(3 * j + 2) == 0L,
        s"zorder: key column ${cols(j)} has ${r.getLong(3 * j + 2)} null " +
          s"rows — z-order key columns must be non-null; filter or " +
          "default them before clustering")
    }
    val mins = cols.indices.map(j => r.getLong(3 * j))
    val maxs = cols.indices.map(j => r.getLong(3 * j + 1))
    df.withColumn("__z", interleaveNormalized(cols, bits, mins, maxs))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-column [[writeClustered]]. */
  def writeClustered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, numFiles: Int): Unit =
    writeClustered(df, path, Seq(colA, colB), bits, numFiles)

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
