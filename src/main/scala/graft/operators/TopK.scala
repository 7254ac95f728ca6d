package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as a custom Aggregator.
  *
  * The window formulation (`row_number over (partition by g order by s)`)
  * shuffles and sorts EVERY row of every group; this aggregator keeps a
  * k-bounded buffer, so Spark's partial aggregation truncates to k per
  * group map-side and the shuffle carries at most k rows per (group,
  * partition) — the same bounded-heap idea the reference hand-rolls inside
  * its beam search (vervectordb/__init__.py:40-76), expressed as a
  * first-class aggregate. At 100 TB per-group data, this is the difference
  * between shuffling the table and shuffling k rows per group per task.
  */
object TopK {

  case class ScoredId(id: Long, sim: Double)

  /** Keeps the k best (sim DESC, id ASC) — deterministic total order. The
    * buffer is maintained sorted, so the per-row fast path is one compare
    * against the current k-th (no allocation, no sort) — under
    * ObjectHashAggregate the buffer lives as an object, making that compare
    * the whole cost for the overwhelming majority of rows. */
  class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def beats(a: ScoredId, w: ScoredId): Boolean =
      a.sim > w.sim || (a.sim == w.sim && a.id < w.id)
    private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
      xs.sortBy(x => (-x.sim, x.id)).take(k)
    override def zero: Seq[ScoredId] = Seq.empty
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      if (k <= 0) b
      else if (b.size < k) best(b :+ a)
      else if (beats(a, b.last)) best(b :+ a)
      else b
    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] = best(b1 ++ b2)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
    override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  }

  /** Per-group top-k: returns (groupCols..., id, sim(rounded 6), rn). Same
    * output contract as the window formulation. */
  def perGroupTopK(df: DataFrame, groupCol: String, idCol: Column, simCol: Column,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())
    df.groupBy(col(groupCol))
      .agg(topk(idCol, simCol).as("_top"))
      .select(col(groupCol), posexplode(col("_top")).as(Seq("_pos", "_s")))
      .select(
        col(groupCol),
        col("_s.id").as("id"),
        round(col("_s.sim"), 6).as("sim"),
        (col("_pos") + 1).cast("long").as("rn"))
  }
}
