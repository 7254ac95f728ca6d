package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bounded keyed registry for operator-internal cached DataFrames.
  *
  * Some operators cache an intermediate the RETURNED frame reads through
  * (BM25's per-doc stats projection, connected components' fixed-point
  * labels). The old scheme — a per-operator `var` unpersisted by the NEXT
  * call — was correct-but-treacherous under concurrency: a second
  * invocation from another thread unpersisted the first's cache while its
  * result was still unconsumed, silently recomputing the whole pipeline
  * from lineage (and the `var` was shared JVM-global state).
  *
  * Here every cached intermediate is keyed by (session, canonicalized
  * logical plan) in an LRU map bounded at [[MaxEntries]]:
  *  - concurrent invocations with DIFFERENT inputs occupy different keys —
  *    neither evicts the other while both are in flight (up to the bound);
  *  - repeated invocations with the SAME input reuse one cache entry
  *    instead of re-deriving and re-caching it;
  *  - eviction unpersists — total block-manager footprint is bounded, and
  *    an evicted-but-still-referenced frame recomputes from lineage
  *    (correct, just slower — the documented cost of running > MaxEntries
  *    distinct cache-bearing operators truly concurrently).
  *
  * Keys are full canonicalized plans, not hashes — structural equality,
  * no collision risk of serving the wrong cache. */
private[graft] object CacheRegistry {

  /** ≥ the number of cache-bearing operators a bench/pipeline run holds in
    * flight at once; small enough that eviction bounds executor storage. */
  val MaxEntries = 8

  private val entries =
    new java.util.LinkedHashMap[(SparkSession, LogicalPlan), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, LogicalPlan), DataFrame]): Boolean =
        if (size() > MaxEntries) { e.getValue.unpersist(); true } else false
    }

  private def keyOf(df: DataFrame): (SparkSession, LogicalPlan) =
    (df.sparkSession, df.queryExecution.analyzed.canonicalized)

  /** A cached frame semantically equal to `df`: the registry's existing
    * entry if one is live, else `df` itself, newly cached (lazily — the
    * caller's first action materializes it).
    *
    * The key (analysis + canonicalization — arbitrarily expensive for
    * deep iterated lineages) is computed OUTSIDE the monitor; only the
    * map access is locked, so one operator's huge plan can't stall every
    * concurrent registry user. */
  def cached(df: DataFrame): DataFrame = {
    val key = keyOf(df)
    synchronized {
      val hit = entries.get(key)
      if (hit != null) hit
      else { df.cache(); entries.put(key, df); df }
    }
  }

  /** Release a cached frame whose LAST consumer has finished: drop the
    * registry entry and unpersist. Strictly the LRU eviction's semantics,
    * just at a point the CALLER knows is safe (a build step that fully
    * consumed its decision tables before returning) — lingering cached
    * blocks otherwise hold executor storage for the rest of the session
    * and surface as storage-eviction/GC pressure on whatever runs later.
    * A concurrent holder of the same plan recomputes from lineage, the
    * same documented cost as being evicted. No-op if not registered. */
  def release(df: DataFrame): Unit = {
    val key = keyOf(df)
    synchronized {
      val prev = entries.remove(key)
      if (prev != null) prev.unpersist()
    }
  }

  /** Adopt an ALREADY-CACHED frame (e.g. materialized inside an iterative
    * loop) into the registry so eviction, not the next call, bounds its
    * lifetime. Replacing an entry unpersists the replaced frame. */
  def register(df: DataFrame): DataFrame = {
    val key = keyOf(df)
    synchronized {
      val prev = entries.put(key, df)
      if (prev != null && (prev ne df)) prev.unpersist()
      df
    }
  }
}
