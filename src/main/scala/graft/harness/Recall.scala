package graft.harness

import org.apache.spark.sql.DataFrame

/** H1 `calculate_recall` (examples/datawhale.py:142-148): recall@k of an
  * approximate result set vs the exact one — |approx ∩ exact| / |exact|.
  * The correctness gate for HNSW/IVF (SURVEY.md §5). */
object Recall {

  def recallAtK(exact: DataFrame, approx: DataFrame, idCol: String): Double = {
    val exactIds = exact.select(idCol).collect().map(_.getLong(0)).toSet
    if (exactIds.isEmpty) return 1.0
    val approxIds = approx.select(idCol).collect().map(_.getLong(0)).toSet
    exactIds.intersect(approxIds).size.toDouble / exactIds.size
  }

  /** Mean recall across per-query result pairs. */
  def meanRecall(pairs: Seq[(DataFrame, DataFrame)], idCol: String): Double =
    pairs.map { case (e, a) => recallAtK(e, a, idCol) }.sum / pairs.size

  /** Driver-side cosine with the engine's zero-norm-→-0 convention — the
    * ground-truth helper for harness/grid code that scores collected rows
    * (one definition; a drifted copy would gate against different math). */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
