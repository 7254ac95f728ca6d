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

  /** A (priority, payload) pair for [[BottomSAggregator]]. */
  case class Prioritized(pri: Long, value: Double)

  /** Keeps the s smallest rows by (pri ASC, value ASC) — the bounded
    * per-group sampling primitive behind the deterministic quantile
    * sketch: with pri an md5-derived 60-bit integer, "bottom s by
    * priority" IS a uniform s-sample of the group, order-free and
    * exactly reproducible in any engine by mirroring the hash (the
    * window formulation — row_number over a per-group sort — shuffles
    * and sorts every row; this buffer truncates to s map-side, so the
    * shuffle carries at most s rows per (group, partition)). Priorities
    * stay LONG throughout: 60-bit values do not survive a double
    * round-trip (2^53 mantissa), which is why [[TopKAggregator]] is not
    * reused with negated-priority scores. */
  class BottomSAggregator(s: Int) extends Aggregator[Prioritized, Seq[Prioritized], Seq[Prioritized]] {
    private def best(xs: Seq[Prioritized]): Seq[Prioritized] =
      xs.sortBy(x => (x.pri, x.value)).take(s)
    override def zero: Seq[Prioritized] = Seq.empty
    override def reduce(b: Seq[Prioritized], a: Prioritized): Seq[Prioritized] =
      if (s <= 0) b
      else if (b.size < s) best(b :+ a)
      else if (a.pri < b.last.pri || (a.pri == b.last.pri && a.value < b.last.value)) best(b :+ a)
      else b
    override def merge(b1: Seq[Prioritized], b2: Seq[Prioritized]): Seq[Prioritized] =
      best(b1 ++ b2)
    override def finish(r: Seq[Prioritized]): Seq[Prioritized] = r
    override def bufferEncoder: Encoder[Seq[Prioritized]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Prioritized]] = ExpressionEncoder()
  }

  /** Per-group bottom-s sample: one row per kept (group, pri, value), at
    * most `s` per group — see [[BottomSAggregator]] for the scale shape.
    * The PRIORITY rides along because the kept set is MERGEABLE by it:
    * bottom-s of a union of per-partial bottom-s sets equals bottom-s of
    * the union (every globally-kept row is kept in its own partial), so
    * streaming partials re-truncate through this same function. */
  def perGroupBottomS(df: DataFrame, groupCol: String, priCol: Column,
      valueCol: Column, s: Int): DataFrame = {
    val bottoms = udaf(new BottomSAggregator(s), ExpressionEncoder[Prioritized]())
    df.groupBy(col(groupCol))
      .agg(bottoms(priCol, valueCol).as("_keep"))
      .select(col(groupCol), explode(col("_keep")).as("_s"))
      .select(col(groupCol), col("_s.pri").as("pri"), col("_s.value").as("value"))
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
