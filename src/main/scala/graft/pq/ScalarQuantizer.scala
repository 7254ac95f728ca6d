package graft.pq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) — the affine per-dimension codec every
  * production vector store offers beside PQ: code_i = nearest of 256 evenly
  * spaced levels on [min_i, max_i], one byte per dimension. 8× smaller than
  * the double vectors (4× vs float32 storage) with no trained codebook.
  *
  * An extension past the reference (whose only codec is PQ,
  * vervectordb/__init__.py:414-501); SQ complements it at the other end of
  * the accuracy/ratio trade: PQ is 32–64× at k-means accuracy, SQ8 is 4–8×
  * at near-exact accuracy.
  *
  * Unlike PQ (k-means → recall-gated), the affine map is closed-form
  * arithmetic, so the whole pipeline — fit (exact per-dim min/max), encode,
  * decode, quantized cosine — has a term-for-term DuckDB mirror
  * ([[graft.queries.OracleSql]] conventions: left-associated IEEE ops) and
  * the serving query is hash-gated like the exact operators.
  *
  * Determinism: min/max are associative-commutative over doubles (no NaNs
  * in vector data), so the fit is independent of partitioning; encode is a
  * pure per-row function of (value, min, step).
  */
final class ScalarQuantizer(val mins: Array[Double], val maxs: Array[Double])
    extends Serializable {
  require(mins.length == maxs.length, "mins/maxs dimensionality mismatch")
  val dim: Int = mins.length

  /** Level width per dimension; 0.0 for a constant dimension (encodes as
    * code 0, reconstructs exactly to the constant). */
  val steps: Array[Double] = Array.tabulate(dim)(i => (maxs(i) - mins(i)) / 255.0)

  /** Nearest-level code: clamp(floor((v − min)/step + 0.5), 0, 255) — the
    * floor(+0.5) form is used on BOTH sides (here and the SQL mirror) so
    * rounding semantics are pinned independent of any round-half mode. */
  def encode(vec: Array[Double]): Array[Byte] = {
    require(vec.length == dim, s"encode: expected dim $dim, got ${vec.length}")
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val step = steps(i)
      out(i) =
        if (step == 0.0) 0.toByte
        else {
          val x = math.floor((vec(i) - mins(i)) / step + 0.5)
          val c = if (x < 0.0) 0.0 else if (x > 255.0) 255.0 else x
          c.toInt.toByte
        }
      i += 1
    }
    out
  }

  /** Reconstruction: min_i + code_i·step_i (max error step_i/2 per dim). */
  def decode(codes: Array[Byte]): Array[Double] = {
    require(codes.length == dim, s"decode: expected dim $dim, got ${codes.length}")
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = mins(i) + (codes(i) & 0xFF).toDouble * steps(i); i += 1 }
    out
  }
}

object ScalarQuantizer {

  /** Fit from the EXACT per-dimension min/max — one distributed aggregate
    * over the table (min/max are cheap, associative, and partial-aggregate
    * map-side; unlike PQ there is nothing to sample or iterate). */
  def fit(df: DataFrame, vecCol: String, dim: Int): ScalarQuantizer = {
    val aggs = (0 until dim).flatMap { i =>
      val e = element_at(col(vecCol), i + 1).cast("double")
      Seq(min(e).as(s"mn$i"), max(e).as(s"mx$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    require(!row.isNullAt(0), "sq fit: no vector data to fit on")
    val mins = Array.tabulate(dim)(i => row.getDouble(2 * i))
    val maxs = Array.tabulate(dim)(i => row.getDouble(2 * i + 1))
    new ScalarQuantizer(mins, maxs)
  }

  /** Add an `sq_code BINARY` column (dim bytes/row). */
  def encodeDf(df: DataFrame, sq: ScalarQuantizer, vecCol: String): DataFrame =
    df.withColumn("sq_code",
      graft.functions.ModelExpressions.sqEncode(col(vecCol), sq))

  /** Reconstruct `vector_approx` from codes. */
  def decodeDf(df: DataFrame, sq: ScalarQuantizer): DataFrame =
    df.withColumn("vector_approx",
      graft.functions.ModelExpressions.sqDecode(col("sq_code"), sq))

  /** Quantized-cosine top-k over stored codes: every row is scored from its
    * dim-byte code (reconstruction inlined in the kernel — the scan reads
    * codes only, 8× fewer bytes than the double vectors), then
    * TakeOrderedAndProject. The score is the exact cosine of the
    * reconstructed vector, so the DuckDB mirror reproduces it bit-for-bit. */
  def adcTopK(encoded: DataFrame, sq: ScalarQuantizer, query: Seq[Double],
      k: Int, idCol: String): DataFrame = {
    require(query.length == sq.dim)
    encoded
      .withColumn("sim",
        round(graft.functions.ModelExpressions.sqScore(col("sq_code"), sq, query.toArray), 6))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
