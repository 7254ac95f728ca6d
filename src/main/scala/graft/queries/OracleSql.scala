package graft.queries

/** Generators for the DuckDB oracle SQL that mirrors the Spark plans.
  *
  * Every arithmetic expression here is the term-for-term, left-associated
  * mirror of the corresponding Catalyst expression in
  * [[graft.functions.VectorFunctions]] — IEEE double ops applied in the same
  * order produce bit-identical results, so hash comparison is exact.
  *
  * Double literals are emitted via [[lit]] as `CAST('<repr>' AS DOUBLE)`:
  * `java.lang.Double.toString` produces a shortest round-trip decimal and
  * strtod-style parsing is correctly rounded, so the oracle parses back the
  * identical double.
  */
object OracleSql {

  def lit(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** Deterministic lineitem vector view — mirror of
    * [[graft.model.VectorModel.lineitemVectors]]. Exposes components v0..v7
    * as flat columns (same doubles as the Spark array elements). */
  val vectorCte: String =
    """v AS (SELECT
      |  ((l_orderkey*8 + l_linenumber)*32768 + l_partkey)*131072 + l_suppkey*64 + CAST(l_quantity AS BIGINT) AS id,
      |  CAST(l_quantity AS DOUBLE) AS v0,
      |  l_extendedprice/CAST('1000.0' AS DOUBLE) AS v1,
      |  l_discount*CAST('10.0' AS DOUBLE) AS v2,
      |  l_tax*CAST('10.0' AS DOUBLE) AS v3,
      |  CAST(l_partkey % 97 AS DOUBLE)/CAST('97.0' AS DOUBLE) AS v4,
      |  CAST(l_suppkey % 89 AS DOUBLE)/CAST('89.0' AS DOUBLE) AS v5,
      |  CAST(l_orderkey % 83 AS DOUBLE)/CAST('83.0' AS DOUBLE) AS v6,
      |  CAST(l_linenumber AS DOUBLE) AS v7,
      |  l_returnflag AS category, l_linestatus AS status
      |FROM lineitem)""".stripMargin

  /** part-derived query vectors — mirror of
    * [[graft.model.VectorModel.partQueries]]. */
  val partQueryCte: String =
    """q AS (SELECT
      |  p_partkey AS query_id,
      |  CAST(p_size AS DOUBLE) AS q0,
      |  p_retailprice/CAST('100.0' AS DOUBLE) AS q1,
      |  CAST(p_partkey % 97 AS DOUBLE)/CAST('97.0' AS DOUBLE) AS q2,
      |  CAST(p_partkey % 89 AS DOUBLE)/CAST('89.0' AS DOUBLE) AS q3,
      |  CAST(p_partkey % 83 AS DOUBLE)/CAST('83.0' AS DOUBLE) AS q4,
      |  CAST('1.0' AS DOUBLE) AS q5, CAST('2.0' AS DOUBLE) AS q6, CAST('3.0' AS DOUBLE) AS q7
      |FROM part WHERE p_partkey <= 5)""".stripMargin

  /** Left-associated expanded dot product: a(0)*b(0) + a(1)*b(1) + ... */
  def dot(a: Int => String, b: Int => String, d: Int): String =
    (0 until d).map(i => s"${a(i)}*${b(i)}").mkString(" + ")

  def normSq(a: Int => String, d: Int): String = dot(a, a, d)

  /** Left-associated squared L2: (a0−b0)·(a0−b0) + … — the mirror of the
    * kernels' accumulation loops ([[graft.functions.IvfKernel.nearest]],
    * [[graft.pq.ProductQuantizer]]'s l2sq): the diff is one double and the
    * square its exact product, added in index order. */
  def l2sq(a: Int => String, b: Int => String, d: Int): String =
    (0 until d).map(i => s"(${a(i)} - ${b(i)})*(${a(i)} - ${b(i)})")
      .mkString(" + ")

  /** Cosine of flat component columns vs a constant query vector, with the
    * reference's zero-norm → 0.0 guard (vervectordb/__init__.py:31-36). */
  def cosineConst(a: Int => String, q: Seq[Double]): String = {
    val d = q.length
    val dotS = dot(a, i => lit(q(i)), d)
    val nA = s"sqrt(${normSq(a, d)})"
    val nQ = s"sqrt(${(0 until d).map(i => s"${lit(q(i))}*${lit(q(i))}").mkString(" + ")})"
    s"CASE WHEN $nA = CAST('0.0' AS DOUBLE) THEN CAST('0.0' AS DOUBLE) ELSE ($dotS)/($nA*$nQ) END"
  }

  /** Cosine between two sets of flat component columns. */
  def cosineCols(a: Int => String, b: Int => String, d: Int): String = {
    val dotS = dot(a, b, d)
    val nA = s"sqrt(${normSq(a, d)})"
    val nB = s"sqrt(${normSq(b, d)})"
    s"CASE WHEN $nA = CAST('0.0' AS DOUBLE) OR $nB = CAST('0.0' AS DOUBLE) THEN CAST('0.0' AS DOUBLE) ELSE ($dotS)/($nA*$nB) END"
  }

  /** 1-indexed DuckDB list element cast to double, e.g. `a.embedding[3]`. */
  def listElem(col: String)(i: Int): String = s"CAST($col[${i + 1}] AS DOUBLE)"

  /** Single-row CTE `m` carrying the exact per-dimension min/max of a list
    * column — the SQL twin of [[graft.pq.ScalarQuantizer.fit]]. */
  def sqMinMaxCte(col: String, table: String, d: Int): String =
    s"""m AS (SELECT ${(0 until d).map(i =>
      s"min(${listElem(col)(i)}) AS mn$i, max(${listElem(col)(i)}) AS mx$i").mkString(", ")}
       |FROM $table)""".stripMargin

  /** SQ8 encode-then-decode of one component, mirroring
    * [[graft.pq.ScalarQuantizer]] term for term: step = (max−min)/255,
    * code = clamp(floor((v−min)/step + 0.5), 0, 255) (floor(+0.5) on both
    * sides pins rounding semantics), reconstruction = min + code·step.
    * References the [[sqMinMaxCte]] alias `m`. */
  def sqReconElem(col: String)(i: Int): String = {
    val mn = s"m.mn$i"
    val step = s"((m.mx$i - $mn)/CAST('255.0' AS DOUBLE))"
    val x = s"floor((${listElem(col)(i)} - $mn)/$step + CAST('0.5' AS DOUBLE))"
    val code = s"CASE WHEN $step = CAST('0.0' AS DOUBLE) THEN CAST('0.0' AS DOUBLE) " +
      s"ELSE least(greatest($x, CAST('0.0' AS DOUBLE)), CAST('255.0' AS DOUBLE)) END"
    s"($mn + $code * $step)"
  }
}
