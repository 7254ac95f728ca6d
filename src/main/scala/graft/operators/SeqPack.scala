package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed concat-and-chunk sequence packing — the training-export
  * stage that lays a corpus end-to-end into fixed-capacity context windows
  * (concat with separators, cut every `cap` tokens): each document gets its
  * global token offset, first window id, offset within that window, and the
  * number of windows it spans.
  *
  * An extension past the reference (no export stage there); the semantics
  * are the standard GPT-style packing every public pretraining pipeline
  * documents.
  *
  * The global token offset is a prefix sum over a DETERMINISTIC shuffled
  * order — and the naive Spark spelling, `sum(n) over (ORDER BY …)` with no
  * partitioning, collapses the whole corpus into ONE window task (Spark
  * even warns). This implementation is the two-level distributed prefix
  * sum instead:
  *
  *   1. order key: h = md5-derived 60-bit hash of the doc id (a seeded,
  *      reproducible shuffle — packing order must decorrelate neighbors),
  *      canonical global order (shard, h, id) where shard = h % S;
  *   2. per-shard token totals — one S-row aggregate — prefix-summed on
  *      the driver into shard base offsets (S is cluster-parallelism
  *      sized, the collect is bounded);
  *   3. per-shard window cumsum ordered (h, id), shifted by the shard's
  *      base offset.
  *
  * Every stage is whole-stage-codegen'd expressions + one S-way window; at
  * 1000 executors raise S — the only serial state is S longs. The integer
  * arithmetic is exact, so the operator is hash-gated against a DuckDB
  * mirror that computes the SAME offsets with a single global window
  * (equal by the prefix-sum decomposition identity). */
object SeqPack {

  /** The packing hash — [[graft.dedup.Dedup.hash60]] over a tagged id, so
    * the pack order is independent of every other hash order in the
    * pipeline. */
  def packHash(id: Column): Column =
    graft.dedup.Dedup.hash60(concat(lit("pack:"), id.cast("string")))

  /** (id, n, start) — the two-level prefix sum itself, shared by [[pack]]
    * and [[spans]]. `baseTokens` shifts the whole pack (the incremental
    * epoch's base — tokens already packed by earlier epochs). */
  private def offsets(df: DataFrame, idCol: String, nTokensCol: Column,
      shards: Int, baseTokens: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(idCol), packHash(col(idCol)).as("h"),
        nTokensCol.cast("long").as("n"))
      .withColumn("shard", (col("h") % shards).cast("int"))
    // stage 2: shard totals -> driver prefix sum -> broadcast base offsets
    val totals = base.groupBy("shard").agg(sum("n").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = baseTokens
    val bases = (0 until shards).map { s =>
      val o = s -> acc; acc += totals.getOrElse(s, 0L); o
    }
    val offsetDf = spark.createDataFrame(bases).toDF("shard", "base")
    // stage 3: per-shard cumsum, shifted
    val w = Window.partitionBy("shard").orderBy(col("h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsetDf), "shard")
      .select(col(idCol), col("n"),
        (col("base") + coalesce(sum("n").over(w), lit(0L))).as("start"))
  }

  /** The window-placement projection shared by [[pack]]/[[packFrom]]/
    * [[packEpochs]]. */
  private def placed(off: DataFrame, idCol: String, cap: Int,
      carryN: Boolean): DataFrame =
    off.select(
      (col(idCol) +: (if (carryN) Seq(col("n")) else Nil)) ++ Seq(
        col("start"),
        expr(s"start div $cap").as("seq"),
        (col("start") % cap).as("off"),
        (expr(s"(start + n - 1) div $cap") - expr(s"start div $cap") + 1L)
          .as("n_seqs")): _*)

  /** [[pack]] shifted to start at `baseTokens` — one incremental EPOCH of
    * the streaming pack ([[graft.streaming.StreamingIngest.packIngest]]):
    * the epoch packs in the same canonical (shard, h, id) order as a
    * batch pack of its rows, placed after everything already packed, so
    * earlier epochs' window ids are never touched. Output carries `n`
    * (the grown layout is self-describing: next base = max(start + n)). */
  def packFrom(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      baseTokens: Long, shards: Int = 32): DataFrame =
    placed(offsets(df, idCol, nTokensCol, shards, baseTokens), idCol, cap,
      carryN = true)

  /** The BATCH TWIN of the streaming pack over an epoch-tagged union:
    * canonical order (epoch, shard, h, id) — epochs pack in arrival
    * order, each after the previous epochs' tokens — so this equals the
    * layout [[graft.streaming.StreamingIngest.packIngest]] grows one
    * micro-batch at a time (StreamingSpec-gated). Same two-level prefix
    * sum with the composite (epoch, shard) first level; driver state is
    * epochs·shards longs here, while the streaming path itself carries
    * only the single running total. */
  def packEpochs(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      epochCol: Column, shards: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(epochCol.cast("long").as("__ep"), col(idCol),
        packHash(col(idCol)).as("h"), nTokensCol.cast("long").as("n"))
      .withColumn("shard", (col("h") % shards).cast("int"))
    val totals = base.groupBy("__ep", "shard").agg(sum("n").as("tot"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val eps = totals.keys.map(_._1).toSeq.distinct.sorted
    var acc = 0L
    val bases = eps.flatMap { e =>
      (0 until shards).map { s =>
        val o = (e, s, acc); acc += totals.getOrElse((e, s), 0L); o
      }
    }
    val offsetDf = spark.createDataFrame(bases).toDF("__ep", "shard", "base")
    val w = Window.partitionBy("__ep", "shard")
      .orderBy(col("h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    placed(
      base.join(broadcast(offsetDf), Seq("__ep", "shard"))
        .select(col(idCol), col("n"),
          (col("base") + coalesce(sum("n").over(w), lit(0L))).as("start")),
      idCol, cap, carryN = true)
  }

  /** Pack `df`'s rows into `cap`-token windows over the canonical order.
    *
    * Output per row: id, `start` (global token offset), `seq` (first
    * window), `off` (offset inside it), `n_seqs` (windows spanned).
    * Requires a positive token count per row (whitespace token counts are
    * ≥ 1 even for empty text). */
  def pack(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      shards: Int = 32): DataFrame =
    placed(offsets(df, idCol, nTokensCol, shards), idCol, cap, carryN = false)

  /** Document-boundary bin packing, first-fit-decreasing — the padding-
    * cutting alternative to [[pack]]'s concat-and-chunk for trainers that
    * never split a document across context windows: docs sorted by token
    * count descending (ties by id) are placed into the first open bin
    * with room, a new bin opened when none fits. Returns one row per doc:
    * `(id, n, shard, bin)` — bin ids are shard-local, (shard, bin) is the
    * global window key.
    *
    * Scale shape: FFD is inherently sequential, so the corpus is hash-
    * sharded first ([[packHash]] — the same seeded decorrelating order
    * the chunk pack uses) and FFD runs INDEPENDENTLY inside each shard as
    * one keyed imperative fold (`flatMapGroups` — genuine per-group
    * sequential state is the documented case for dropping out of
    * expressions; a Catalyst `aggregate` accumulator was tried first and
    * copies the growing assignment array per element, O(docs²) per
    * shard). Per-shard state is the shard's (n, id) list plus the
    * open-bin remainders (≤ shardTokens/cap longs), and `shards` is the
    * boundedness knob: size it so a shard holds ~10⁵ docs and a 100 TB
    * corpus is thousands of independent linear folds, each
    * bin-quality-equivalent to global FFD up to the usual shard-boundary
    * slack. (The first-fit scan itself is O(open bins) per doc — the
    * classical tree-over-remainders trick applies if a profile ever
    * shows it.) Ids must be integral (the corpus key contract); docs
    * longer than `cap` are clamped to `cap` (truncation is the trainer's
    * concern; placement stays deterministic). */
  def ffdPack(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      shards: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capL = cap.toLong
    df.select(col(idCol).cast("long").as("doc"),
        (packHash(col(idCol)) % shards).cast("int").as("shard"),
        least(nTokensCol.cast("long"), lit(capL)).as("n"))
      .as[(Long, Int, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (shard, it) =>
        val items = it.toArray.sortBy { case (doc, _, n) => (-n, doc) }
        firstFit(cap, scala.collection.mutable.ArrayBuffer.empty[Long],
          items.iterator.map { case (doc, _, n) => (doc, n) })
          .map { case (doc, n, bin) => (doc, n, shard, bin) }
      }
      .toDF(idCol, "n", "shard", "bin")
  }

  /** The first-fit walk itself — ONE definition shared by [[ffdPack]],
    * [[ffdEpochs]], and the incremental ingest
    * ([[graft.streaming.StreamingIngest.ffdIngestBatch]]), because their
    * replay/twin-equality contracts require the three to stay
    * bit-identical (tie order, cap arithmetic, bin-id assignment).
    * `bins` holds the open-bin remainders in creation order (index = bin
    * id) and MAY be pre-seeded with a prior state's remainders; `items`
    * must already be in placement order. Emits (doc, n, bin). */
  private[graft] def firstFit(cap: Int,
      bins: scala.collection.mutable.ArrayBuffer[Long],
      items: Iterator[(Long, Long)]): Iterator[(Long, Long, Long)] = {
    val capL = cap.toLong
    items.map { case (doc, n) =>
      val fit = bins.indexWhere(_ >= n)
      val bin = if (fit < 0) { bins += capL - n; bins.length - 1 }
        else { bins(fit) -= n; fit }
      (doc, n, bin.toLong)
    }
  }

  /** EPOCH-ORDERED batch twin of the incremental FFD pack
    * ([[graft.streaming.StreamingIngest.ffdIngest]]): epoch e's docs
    * first-fit (count-descending WITHIN the epoch) into the bins as
    * epoch e−1 left them — earlier epochs' assignments are FROZEN (a
    * grown layout never moves a placed doc), new bins open past the
    * existing ids. A single-epoch input degenerates to exactly
    * [[ffdPack]]. Same shard-keyed linear fold; first-fit scans bins in
    * creation order (ascending bin id), which is what makes the
    * incremental state — per-shard remainders reconstructed from the
    * assignment log — replay-identical. */
  def ffdEpochs(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      epochCol: Column, shards: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capL = cap.toLong
    df.select(col(idCol).cast("long").as("doc"),
        (packHash(col(idCol)) % shards).cast("int").as("shard"),
        least(nTokensCol.cast("long"), lit(capL)).as("n"),
        epochCol.cast("long").as("ep"))
      .as[(Long, Int, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (shard, it) =>
        val items = it.toArray
          .sortBy { case (doc, _, n, ep) => (ep, -n, doc) }
        firstFit(cap, scala.collection.mutable.ArrayBuffer.empty[Long],
          items.iterator.map { case (doc, _, n, _) => (doc, n) })
          .map { case (doc, n, bin) => (doc, n, shard, bin) }
      }
      .toDF(idCol, "n", "shard", "bin")
  }

  /** The exploded window-placement map — one row per (doc, window) pair
    * with the token range `[a, b]` the doc occupies inside that window:
    * the export manifest a sharded training writer consumes (each writer
    * takes a window range and joins its slice of this map). Row count is
    * Σ n_seqs = rows + ⌈tokens/cap⌉-ish, i.e. linear; the explode is
    * per-row `sequence(first, last)`, no shuffle beyond [[offsets]]'s. */
  def spans(df: DataFrame, idCol: String, nTokensCol: Column, cap: Int,
      shards: Int = 32): DataFrame =
    offsets(df, idCol, nTokensCol, shards)
      .select(col(idCol), col("start"), col("n"),
        expr(s"start div $cap").as("first_seq"),
        expr(s"(start + n - 1) div $cap").as("last_seq"))
      .select(col(idCol), col("start"), col("n"),
        col("first_seq"), col("last_seq"),
        // guard the documented n ≥ 1 contract: for a zero-token row
        // last_seq < first_seq and Spark's sequence() would generate a
        // DESCENDING range — phantom manifest rows with inverted spans
        // (and a divergence from the oracle, whose generate_series is
        // empty on a descending range). when() nulls the array and
        // explode drops the row: zero windows for zero tokens.
        explode(expr(
          "CASE WHEN n >= 1 THEN sequence(first_seq, last_seq) END")).as("seq"))
      .select(col(idCol), col("seq"),
        when(col("seq") === col("first_seq"), col("start") % cap)
          .otherwise(lit(0L)).as("a"),
        when(col("seq") === col("last_seq"), (col("start") + col("n") - 1) % cap)
          .otherwise(lit(cap - 1L)).as("b"))
}
