package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partition-width guards for fan-out-heavy stages.
  *
  * A stage whose COMPUTE is superlinear in its input (pair-generating
  * self-joins, cross joins, per-partition index builds) must not inherit its
  * parallelism from the input's BYTE size. Two ways that happens:
  *
  *  - a small parquet file scans as one split, so everything narrow
  *    downstream of it — including the probe side of a quadratic self-join —
  *    runs as ONE task regardless of cluster size;
  *  - AQE coalesces a small shuffle output to one partition (its heuristic
  *    is bytes, not downstream cost), then happily converts the following
  *    join to a broadcast join whose probe side is that single partition.
  *
  * Both showed up verbatim in this repo's bench: the n² SimHash pair join
  * and the shingle self-join ran serially on local[32] and got *slower*
  * with more cores. The guards below pin such stages at the session's
  * default parallelism:
  *
  *  - [[widen]]/[[widenBy]] check first and are no-ops on already-wide
  *    inputs — use them on scan-derived inputs, where the static partition
  *    count is truthful (at warehouse scale those inputs are already wide
  *    and no shuffle is added);
  *  - [[spread]] always repartitions — use it on post-shuffle inputs, where
  *    the static count lies (AQE may still coalesce it at runtime). An
  *    explicit numPartitions repartition is exempt from AQE coalescing.
  */
object Par {

  private def target(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Round-robin widen of a SCAN-DERIVED input; no-op if already wide.
    *
    * Must only be fed plans with no shuffle upstream: the partition-count
    * probe (`df.rdd`) is free on a pure scan lineage, but under AQE it
    * eagerly materializes any upstream shuffle stages — and for
    * post-shuffle plans the static count is a lie anyway (AQE may coalesce
    * at runtime). Post-shuffle inputs take [[spread]]. */
  def widen(df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions >= target(df)) df else df.repartition(target(df))

  /** Hash-repartition on the downstream join/group keys to the session
    * default, unconditionally. Used before superlinear self-joins: the
    * join would shuffle by these keys anyway, so this pins the width
    * without adding an exchange, stays exempt from AQE coalescing
    * (explicit numPartitions), and — unlike a partition-count probe —
    * never executes upstream stages early. */
  def widenBy(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(target(df), keys: _*)

  /** Unconditional round-robin (or keyed) repartition to the session
    * default — for post-shuffle inputs feeding superlinear work. */
  def spread(df: DataFrame, keys: Column*): DataFrame =
    if (keys.isEmpty) df.repartition(target(df))
    else df.repartition(target(df), keys: _*)
}
