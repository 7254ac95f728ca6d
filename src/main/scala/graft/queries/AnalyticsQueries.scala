package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics queries (aggregation / join / window) over the
  * TPC-H-ish tables, with DuckDB mirrors.
  *
  * Determinism notes: money sums go through a cents-as-BIGINT cast so the
  * sum is exact integer arithmetic (order-independent); `round()` on a
  * positive double is half-away-from-zero in both engines.
  */
object AnalyticsQueries {

  /** Conversion funnel over the event stream: per user, the earliest
    * `view`, the earliest `click` strictly after it, the earliest
    * `purchase` strictly after that — the ordered-sequence-within-history
    * query every product-analytics engine ships. Stage times are nested
    * per-user window minima (each stage's predicate references the
    * previous stage's column), so the whole funnel costs ONE shuffle on
    * user_id + three window passes over the same partitions — no
    * self-joins, no per-stage scans. The summary is the per-user distinct
    * (150 rows here; |users| rows at scale) counted into one row. */
  /** Stage times per user over a (user_id, event_type, tsu) frame — the
    * funnel core, factored so FunnelSpec can drive constructed event
    * sequences through the exact serving logic. */
  private[graft] def funnelStages(events: DataFrame,
      stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val pred =
        if (i == 0) col("event_type") === stage
        else col("event_type") === stage && col("tsu") > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(pred, col("tsu"))).over(w))
    }
    staged.select(col("user_id") +:
      stages.indices.map(i => col(s"t${i + 1}")): _*).distinct()
  }

  val FunnelStages = Seq("view", "click", "purchase")

  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelStages(
      graft.model.VectorModel.events(spark, dir)
        .withColumn("tsu", expr("ts div 1000"))
        .select("user_id", "event_type", "tsu"),
      FunnelStages)
      .agg(
        count(col("t1")).as("viewed"),
        count(col("t2")).as("clicked_after_view"),
        count(col("t3")).as("purchased_after_click"))

  val eventsFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tsu END)
      |         OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND tsu > t1 THEN tsu END)
      |         OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tsu > t2 THEN tsu END)
      |         OVER (PARTITION BY user_id) AS t3 FROM s2),
      |u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
      |SELECT count(t1) AS viewed, count(t2) AS clicked_after_view,
      |  count(t3) AS purchased_after_click
      |FROM u""".stripMargin

  /** Pricing-summary aggregation (TPC-H Q1 shape): map-side partial
    * aggregation + one shuffle on the tiny group key. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100.0).cast("long")).as("sum_price_cents"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_price_cents,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue top-20 (TPC-H Q3 shape): broadcast the small dimension side,
    * aggregate revenue in exact cents, top-k via TakeOrderedAndProject. */
  def q3JoinTopK(spark: SparkSession, dir: String): DataFrame = {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0)
          .cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
      .limit(20)
  }

  val q3JoinTopKSql: String =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(round(l_extendedprice*(CAST('1.0' AS DOUBLE)-l_discount)*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue_cents DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** Top-3 events per user by value (window ranking over the events
    * stream table). */
  def eventsWindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
    graft.model.VectorModel.events(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rn"))
      .orderBy("user_id", "rn")
  }

  val eventsWindowTopKSql: String =
    """SELECT user_id, event_id, value, rn FROM (
      |  SELECT user_id, event_id, value,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS BIGINT) AS rn
      |  FROM events)
      |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** Per-type event rate stats over hourly buckets — the batch shape of the
    * streaming windowed aggregation in graft.streaming. `ts` arrives as
    * nanos-since-epoch LONG ([[graft.model.VectorModel.events]]), so the
    * hour bucket is exact integer division in both engines. */
  def eventsHourlyAgg(spark: SparkSession, dir: String): DataFrame =
    graft.model.VectorModel.events(spark, dir)
      .groupBy(col("event_type"),
        (expr("ts div 3600000000000") * 3600).as("hour_epoch"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_value_cents"))
      .orderBy("event_type", "hour_epoch")

  val eventsHourlyAggSql: String =
    """SELECT event_type,
      |  (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_value_cents
      |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_epoch""".stripMargin

  /** Epoch-anchored day length in ns (integer day bucketing is
    * engine-stable, unlike date_trunc) and the retention horizon. */
  val DayNs = 86400000000000L
  val RetentionMaxOffset = 14

  /** Daily cohort retention triangle: cohort = a user's first active day;
    * n_users = distinct users of that cohort active again at each day
    * offset (offset 0 row = cohort size).
    *
    * Scale shape: the cohort day is a min-over-user WINDOW, so the whole
    * operator is ONE corpus exchange on user_id (no cohort join to
    * mis-plan as a broadcast of the per-user table, which grows with the
    * corpus) followed by the bounded (cohort, offset) countDistinct
    * aggregate — duplicate user-days need no pre-distinct, countDistinct
    * absorbs them. Bounded output: cohorts × offsets. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    graft.model.VectorModel.events(spark, dir)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .withColumn("cohort_day", min("day").over(byUser))
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .where(col("day_offset") <= RetentionMaxOffset)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val eventsRetentionSql: String =
    s"""WITH w AS (SELECT user_id, epoch_ns(ts) // $DayNs AS day FROM events),
       |f AS (SELECT user_id, min(day) AS cohort_day FROM w GROUP BY user_id),
       |a AS (SELECT DISTINCT user_id, day FROM w)
       |SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
       |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
       |FROM a JOIN f USING (user_id)
       |WHERE a.day - f.cohort_day <= $RetentionMaxOffset
       |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  /** Session gap: 1 hour in microseconds. Session time is µs in both
    * engines — DuckDB truncates parquet TIMESTAMP(NANOS) to its µs
    * TIMESTAMP, so Spark's nanos are floored to match (`ts div 1000`). */
  val SessionGapUs: Long = 3600L * 1000000L

  /** Gap-based sessionization per user (batch twin of the streaming
    * stateful operator in graft.streaming): lag → session-start flags →
    * running sum as session id → per-session aggregates. Two window passes
    * over one shuffle-by-user partitioning. */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    graft.model.VectorModel.events(spark, dir)
      .withColumn("tsu", expr("ts div 1000"))
      .withColumn("prev_ts", lag("tsu", 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("tsu") - col("prev_ts") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("is_start").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("(max(tsu) - min(tsu)) div 1000").as("duration_ms"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_value_cents"))
      .orderBy("user_id", "session_id")
  }

  val eventsSessionsSql: String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tsu, value,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
       |         THEN 1 ELSE 0 END AS is_start
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)),
       |s AS (
       |  SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY tsu ASC, event_id ASC
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM x)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  (max(tsu) - min(tsu)) // 1000 AS duration_ms,
       |  CAST(sum(CAST(round(value*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_value_cents
       |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Backward as-of join: each event enriched with the user's most recent
    * order at-or-before the event time (orders = slowly-changing dimension).
    * Implemented by [[graft.operators.AsOfJoin]] (union + single shuffle +
    * running last — no range-join explosion); the oracle uses DuckDB's
    * native ASOF JOIN, so the operator is checked against an independent
    * implementation of the semantics. */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val events = graft.model.VectorModel.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tsu"))
    val dedupe = Window.partitionBy("user_id", "odus")
      .orderBy(col("o_orderkey").desc)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(
        col("o_custkey").as("user_id"),
        // parquet stores TIMESTAMP_NTZ; session TZ is UTC so the cast is a
        // pure reinterpretation, matching DuckDB's naive epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("odus"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100.0).cast("long").as("order_cents"))
      .withColumn("_rn", row_number().over(dedupe))
      .where(col("_rn") === 1)
      .drop("_rn")
    AsOfJoin.asOfBackward(events, orders, "user_id", "tsu", "odus",
      Seq("o_orderkey", "order_cents"), tieBreak = "o_orderkey")
      .select("event_id", "user_id", "o_orderkey", "order_cents")
      .orderBy("event_id")
  }

  val eventsAsOfOrdersSql: String =
    """WITH o AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) AS odus, o_orderkey,
      |    CAST(round(o_totalprice*CAST('100.0' AS DOUBLE)) AS BIGINT) AS order_cents,
      |    row_number() OVER (PARTITION BY o_custkey, epoch_us(o_orderdate)
      |      ORDER BY o_orderkey DESC) AS rn
      |  FROM orders),
      |od AS (SELECT * FROM o WHERE rn = 1),
      |e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
      |SELECT e.event_id, e.user_id, od.o_orderkey, od.order_cents
      |FROM e ASOF JOIN od ON e.user_id = od.o_custkey AND e.tsu >= od.odus
      |ORDER BY event_id""".stripMargin

  /** Set operations (INTERSECT/EXCEPT with distinct semantics): part keys
    * seen at both extreme quantities but never at high tax. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def keys(pred: org.apache.spark.sql.Column) =
      li.where(pred).select("l_partkey").distinct()
    keys(col("l_quantity") >= 45)
      .intersect(keys(col("l_quantity") <= 5))
      .except(keys(col("l_tax") > 0.07))
      .orderBy("l_partkey")
  }

  val setOpsSql: String =
    """SELECT l_partkey FROM (
      |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 45
      |  INTERSECT
      |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity <= 5
      |  EXCEPT
      |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_tax > CAST('0.07' AS DOUBLE))
      |ORDER BY l_partkey""".stripMargin

  /** Scalar-function parity sampler: string/math built-ins whose semantics
    * must agree across engines (1-based substr, truncating int ops,
    * ceil/floor as BIGINT). */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_type")).cast("long").as("type_len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        (col("p_partkey") % 7).as("k_mod"),
        ceil(col("p_retailprice") / 10.0).cast("long").as("price_ceil"),
        floor(col("p_retailprice") / 10.0).cast("long").as("price_floor"),
        greatest(col("p_size").cast("long"), col("p_partkey") % 50).as("g"),
        abs(col("p_size") - 25).cast("long").as("size_dev"))
      .orderBy("p_partkey")

  val scalarFuncsSql: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  substr(p_name, 1, 8) AS name8,
      |  CAST(length(p_type) AS BIGINT) AS type_len,
      |  p_brand || '-' || p_type AS brand_type,
      |  p_partkey % 7 AS k_mod,
      |  CAST(ceil(p_retailprice/CAST('10.0' AS DOUBLE)) AS BIGINT) AS price_ceil,
      |  CAST(floor(p_retailprice/CAST('10.0' AS DOUBLE)) AS BIGINT) AS price_floor,
      |  greatest(CAST(p_size AS BIGINT), p_partkey % 50) AS g,
      |  CAST(abs(p_size - 25) AS BIGINT) AS size_dev
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Distinct aggregates per group (two-phase distinct shuffle). */
  def countDistinct_(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val countDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Join-type coverage: semi, anti, and outer-null counts — ONE job, not
    * three. A single left-outer join against the distinct order customer
    * keys yields a has-order flag per customer; semi = flag set, anti =
    * flag unset, and outer-null ≡ anti (a left-outer row with a null right
    * side IS a non-matching customer — orders carries no null o_orderkey).
    * The three counts are one aggregate over that join, then pivoted to
    * rows driver-free with explode(array(struct…)). */
  def joinTypes(spark: SparkSession, dir: String): DataFrame = {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val orderKeys = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey")).distinct()
    customer
      .join(orderKeys, col("c_custkey") === col("o_custkey"), "left_outer")
      .agg(
        coalesce(sum(when(col("o_custkey").isNotNull, 1L)), lit(0L)).as("semi"),
        coalesce(sum(when(col("o_custkey").isNull, 1L)), lit(0L)).as("anti"))
      .select(explode(array(
        struct(lit("anti").as("join_type"), col("anti").as("n")),
        struct(lit("outer_null").as("join_type"), col("anti").as("n")),
        struct(lit("semi").as("join_type"), col("semi").as("n")))).as("r"))
      .select(col("r.join_type"), col("r.n"))
      .orderBy("join_type")
  }

  val joinTypesSql: String =
    """SELECT 'anti' AS join_type, count(*) AS n FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'outer_null', count(*) FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  WHERE o_orderkey IS NULL
      |UNION ALL
      |SELECT 'semi', count(*) FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY join_type""".stripMargin

  /** Window frames: per-user running total and 3-row moving sum in cents. */
  def eventsRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    graft.model.VectorModel.events(spark, dir)
      .withColumn("cents", round(col("value") * 100.0).cast("long"))
      .select(
        col("user_id"), col("event_id"),
        sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_cents"),
        sum("cents").over(w.rowsBetween(-2, 0)).as("moving3_cents"))
      .orderBy("user_id", "event_id")
  }

  val eventsRunningSql: String =
    """SELECT user_id, event_id,
      |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY tsn ASC, event_id ASC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
      |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY tsn ASC, event_id ASC
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving3_cents
      |FROM (SELECT user_id, event_id, epoch_ns(ts) AS tsn,
      |        CAST(round(value*CAST('100.0' AS DOUBLE)) AS BIGINT) AS cents FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  /** Incident attribution window: 10 minutes, in µs. */
  val IncidentWindowUs: Long = 10L * 60L * 1000000L

  /** Range join: every error event opens a 10-minute incident window;
    * same-user events falling inside it are attributed to the incident —
    * the interval-containment join Spark lacks natively.
    * [[graft.operators.RangeJoin]] bands the time axis so this plans as an
    * equi-join (+ residual filter), not a nested loop; the oracle
    * recomputes it as a plain BETWEEN join. */
  def eventsRangeJoinIncidents(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeJoin
    val events = graft.model.VectorModel.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tsu"), col("value"))
    val incidents = graft.model.VectorModel.events(spark, dir)
      .where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("err_user"),
        expr("ts div 1000").as("lo"))
      .withColumn("hi", col("lo") + IncidentWindowUs)
    RangeJoin.pointInInterval(events, incidents, "tsu", "lo", "hi",
        IncidentWindowUs, Seq("user_id" -> "err_user"))
      .groupBy("error_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_value_cents"))
      .orderBy("error_id")
  }

  val eventsRangeJoinIncidentsSql: String =
    s"""SELECT er.event_id AS error_id, count(*) AS n_events,
       |  CAST(sum(CAST(round(e.value*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_value_cents
       |FROM events e JOIN events er
       |  ON e.user_id = er.user_id AND er.event_type = 'error'
       |  AND epoch_us(e.ts) BETWEEN epoch_us(er.ts) AND epoch_us(er.ts) + $IncidentWindowUs
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** HLL++ sketch aggregate: approximate distinct users per event type —
    * the cardinality-estimation shape of a 100 TB pipeline (a sketch
    * merges; an exact distinct shuffles every key). Deterministic
    * (hash-based, order-independent) but not cross-engine exact → rows-only
    * check; SketchSpec bounds the relative error vs the exact distinct. */
  /** HLL register count (p = 4): sized so this corpus's per-type
    * cardinalities (~150 at sf0.01) sit in the RAW-estimate regime
    * (n/m > 2.5 — no small-range linear counting, whose ln() is not
    * bit-stable across engines). */
  val HllM = 16

  /** α·m² for m = 16 (Flajolet et al.'s published constant 0.673). */
  private val HllAlphaM2 = 0.673 * HllM * HllM

  /** ρ cap: registers saturate at 48 so every 2^(−M) term is ≥ 2^(−48)
    * while the partial sums stay < 2^3 (16 terms ≤ 1/2 each) — a 51-bit
    * exponent span, inside the 53-bit significand, which is what makes
    * the register sum EXACT in any order unconditionally (an uncapped ρ
    * of 54+ — probability ~2^-53 per event, but possible — would let
    * Spark's partition-order sum and DuckDB's scan-order sum round
    * differently). Cardinality impact starts around 2^48 distincts. */
  private val HllRhoCap = 48

  /** Leading-zero rank of the 56-bit suffix: ρ = position of the highest
    * set bit from the top (+1), saturated at [[HllRhoCap]] — a generated
    * descending-threshold CASE over exact integer literals, identical on
    * both engines (no float log2 anywhere). */
  private def rhoWhen: org.apache.spark.sql.Column =
    (1 until HllRhoCap).foldLeft(when(lit(false), 0)) { (acc, r) =>
      acc.when(col("w") >= (1L << (56 - r)), r)
    }.otherwise(HllRhoCap)

  private def rhoCaseSql: String =
    (1 until HllRhoCap).map(r => s"WHEN w >= ${1L << (56 - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE $HllRhoCap END")

  /** Deterministic HLL distinct-user estimate per event type — the
    * engine-owned, ORACLE-EXACT sketch twin of [[approxUsers]] (whose
    * Spark-native HLL++ hashes are not reproducible outside the JVM):
    * md5-derived 60-bit hash → 4 bucket bits + 56-bit suffix rank ρ
    * (integer CASE saturated at [[HllRhoCap]], [[rhoWhen]]), per-(type,
    * bucket) register = max ρ (integer, order-free), and the raw
    * estimate α·m²/Σ2^(−M_j). EVERY float step is exact: 2^(−M) is
    * one-bit dyadic (1/(1<<M), exact division), the ρ cap bounds the
    * register sum's exponent span to 51 bits — inside the 53-bit
    * significand, so every partial sum is exact IN ANY ORDER,
    * unconditionally — and the final α·m²/S is a single
    * correctly-rounded division — so the sketch is value-level
    * hash-gated, unlike any libm-based estimator. `exact_users` rides
    * along so the estimate's error is visible in the output; SketchSpec
    * gates the accuracy. Scale shape: two narrow aggregates (register
    * table = types × 16 rows). */
  /** HLL register table of an events frame: (event_type, bucket, m) —
    * types×[[HllM]] rows. ONE shared definition for the batch sketch and
    * the streaming partials: registers merge by MAX, so per-batch
    * partials maxed per (type, bucket) equal this over the union. */
  private[graft] def hllRegisters(ev: DataFrame): DataFrame =
    ev
      .withColumn("h", graft.dedup.Dedup.hash60(
        concat(lit("hll:"), col("user_id").cast("string"))))
      .withColumn("bucket", col("h") % HllM)
      .withColumn("w", expr(s"h div $HllM"))
      .withColumn("rho", rhoWhen)
      .groupBy("event_type", "bucket").agg(max("rho").as("m"))

  /** Raw HLL estimate from a register table — the serving tail shared by
    * [[hllUsers]] and the grown-state reader ([[graft.streaming.
    * StreamingIngest.hllRegistersFrom]]'s consumers): per type,
    * α·m²/(Σ2^(−M) + zero-register count). */
  private[graft] def hllEstimate(regs: DataFrame): DataFrame =
    regs.groupBy("event_type").agg(
      sum(lit(1.0) / expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)"))
        .as("sp"),
      count(lit(1)).as("np"))
      .select(col("event_type"),
        round(lit(HllAlphaM2) /
          (col("sp") + (lit(HllM) - col("np")).cast("double")), 6)
          .as("hll_users"))

  def hllUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.model.VectorModel.events(spark, dir)
    val est = hllEstimate(hllRegisters(ev))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hll_users"), col("exact_users"))
      .orderBy("event_type")
  }

  lazy val hllUsersSql: String =
    s"""WITH h AS (SELECT event_type,
       |    ('0x'||substr(md5('hll:'||CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
       |  FROM events),
       |b AS (SELECT event_type, hv % $HllM AS bucket, hv // $HllM AS w FROM h),
       |r AS (SELECT event_type, bucket, max($rhoCaseSql) AS m
       |  FROM b GROUP BY event_type, bucket),
       |s AS (SELECT event_type,
       |    sum(CAST('1.0' AS DOUBLE) / CAST((CAST(1 AS BIGINT) << m) AS DOUBLE)) AS sp,
       |    count(*) AS np
       |  FROM r GROUP BY event_type),
       |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY event_type)
       |SELECT s.event_type AS event_type,
       |  round(${OracleSql.lit(HllAlphaM2)}
       |    / (s.sp + CAST($HllM - s.np AS DOUBLE)), 6) AS hll_users,
       |  x.exact_users AS exact_users
       |FROM s JOIN x USING (event_type) ORDER BY event_type""".stripMargin

  def approxUsers(spark: SparkSession, dir: String): DataFrame =
    graft.model.VectorModel.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Exact interpolated percentiles of event value per type (oracle:
    * DuckDB quantile_cont uses the same linear-interpolation definition). */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    graft.model.VectorModel.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .orderBy("event_type")

  val valuePercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, CAST('0.5' AS DOUBLE)), 6) AS p50,
      |  round(quantile_cont(value, CAST('0.95' AS DOUBLE)), 6) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- deterministic frequency sketch: Count-Min heavy hitters ----------

  /** Count-Min depth (independent hash rows) and width (cells per row).
    * Width 64 gives the classic ε = e/w ≈ 0.0425 per-row overcount bound
    * (≤ εn with probability 1−1/e per row, 1−e^−3 over the min of 3);
    * deliberately small so the sketch's overcounts are VISIBLE in the
    * output next to the exact counts rather than vacuously zero. */
  val CmDepth = 3
  val CmWidth = 64

  /** Cell of `key` under hash row `r`: md5-derived 60-bit integer mod
    * width — the same engine-mirrorable hash family as [[hllUsers]],
    * salted per row by the literal prefix. */
  private def cmCell(r: Int, key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.dedup.Dedup.hash60(concat(lit(s"cm$r:"), key)) % CmWidth

  /** Count-Min estimates for EVERY key (exact count alongside) — the
    * sketch the top-k query and SketchSpec's εn/no-undercount gates read.
    * Scale shape: the counter table is depth×width rows whatever the
    * corpus (one explode-by-depth pass with map-side partial
    * aggregation), the per-key exact counts are one hash aggregate
    * bounded by key cardinality, and the estimate join broadcasts the
    * 192-row counter table — nothing corpus-sized moves. Every step is
    * integer, so estimates are value-level exact cross-engine. */
  /** Count-Min counter table of a key frame (one column `k`): (r, cell,
    * c) — depth×width rows. ONE shared definition for the batch sketch
    * and the streaming partials ([[graft.streaming.StreamingIngest.
    * sketchIngestBatch]]): counters merge by ADDITION, so per-batch
    * partials summed per (r, cell) equal this over the union — the
    * mergeability that makes the sketch a streaming-native structure. */
  private[graft] def cmCounters(keys: DataFrame): DataFrame =
    keys
      .select(explode(array((0 until CmDepth).map(r =>
        struct(lit(r).as("r"), cmCell(r, col("k")).as("cell"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("c"))

  private[graft] def cmUserEstimates(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.model.VectorModel.events(spark, dir)
      .select(col("user_id").cast("string").as("k"))
    val counters = cmCounters(ev)
    val users = ev.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
    (0 until CmDepth).foldLeft(users) { (df, r) =>
      df.join(
        broadcast(counters.where(col("r") === r)
          .select(col("cell").as(s"_cell$r"), col("c").as(s"_c$r"))),
        cmCell(r, df("k")) === col(s"_cell$r"))
    }
      .withColumn("est_cnt", least((0 until CmDepth).map(r => col(s"_c$r")): _*))
      .select(col("k").cast("long").as("user_id"), col("est_cnt"), col("exact_cnt"))
  }

  /** Heavy hitters via the Count-Min sketch: top 20 users by ESTIMATED
    * event count, exact count alongside so the overcount is visible.
    * Deterministic total order (est DESC, user_id ASC) → the LIMIT is
    * stable; every arithmetic step integer → hash-gated, unlike any
    * randomized-seed sketch. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    cmUserEstimates(spark, dir)
      .orderBy(col("est_cnt").desc, col("user_id"))
      .limit(20)

  lazy val heavyHittersSql: String = {
    def cell(r: String, k: String): String =
      s"('0x'||substr(md5('cm'||$r||':'||$k),1,15))::BIGINT % $CmWidth"
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
       |rs AS (SELECT CAST(unnest(generate_series(0, ${CmDepth - 1})) AS INTEGER) AS r),
       |counters AS (SELECT rs.r AS r, ${cell("CAST(rs.r AS VARCHAR)", "ev.k")} AS cell,
       |    count(*) AS c
       |  FROM ev CROSS JOIN rs GROUP BY 1, 2),
       |users AS (SELECT k, count(*) AS exact_cnt FROM ev GROUP BY k),
       |est AS (SELECT u.k AS k, u.exact_cnt AS exact_cnt, min(ct.c) AS est_cnt
       |  FROM users u CROSS JOIN rs
       |  JOIN counters ct ON ct.r = rs.r
       |    AND ct.cell = ${cell("CAST(rs.r AS VARCHAR)", "u.k")}
       |  GROUP BY u.k, u.exact_cnt)
       |SELECT CAST(k AS BIGINT) AS user_id, est_cnt, exact_cnt
       |FROM est ORDER BY est_cnt DESC, user_id LIMIT 20""".stripMargin
  }

  // ---- deterministic quantile sketch: md5-priority bottom-s sample ------

  /** Sample size per group. 256 of a ~2500-row group bounds the rank
    * error of the sampled quantile to ~3/√s ≈ 0.19 at 3σ-equivalent
    * (gated empirically in SketchSpec against the exact CDF). */
  val QsSampleSize = 256

  /** Deterministic quantile sketch: per event type, interpolated p50/p95
    * over the md5-priority bottom-[[QsSampleSize]] sample — the
    * fixed-memory quantile estimator a 100 TB dashboard runs instead of
    * an exact per-group sort. "Bottom s by an md5 priority" is a uniform
    * sample that is ORDER-FREE (any scan order keeps the same s rows)
    * and exactly mirrorable in SQL by the same hash — unlike reservoir
    * sampling, whose kept set depends on arrival order. Scale shape:
    * [[graft.operators.TopK.perGroupBottomS]] truncates to s map-side,
    * so the shuffle carries ≤ s rows per (group, partition); the
    * interpolation then runs on s rows per group. The sampled quantile
    * definition (linear interpolation) matches DuckDB's quantile_cont,
    * the [[valuePercentiles]] precedent. */
  /** (event_type, pri, value) with the md5 sampling priority — the shared
    * input shape of the batch sketch and the streaming partials. */
  private[graft] def qsPrioritized(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      graft.dedup.Dedup.hash60(
        concat(lit("qs:"), col("event_id").cast("string"))).as("pri"),
      col("value"))

  /** Interpolated p50/p95 over a kept (event_type, pri, value) sample —
    * the serving tail shared by the batch sketch and the grown-state
    * reader. */
  private[graft] def qsQuantiles(keep: DataFrame): DataFrame =
    keep.groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .orderBy("event_type")

  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    qsQuantiles(graft.operators.TopK.perGroupBottomS(
      qsPrioritized(graft.model.VectorModel.events(spark, dir)),
      "event_type", col("pri"), col("value"), QsSampleSize))

  lazy val quantileSketchSql: String =
    s"""WITH pri AS (SELECT event_type, value,
       |    ('0x'||substr(md5('qs:'||CAST(event_id AS VARCHAR)),1,15))::BIGINT AS pri
       |  FROM events),
       |keep AS (SELECT event_type, value FROM (
       |    SELECT event_type, value,
       |      row_number() OVER (PARTITION BY event_type ORDER BY pri, value) AS rn
       |    FROM pri) WHERE rn <= $QsSampleSize)
       |SELECT event_type, count(*) AS n_sampled,
       |  round(quantile_cont(value, CAST('0.5' AS DOUBLE)), 6) AS p50,
       |  round(quantile_cont(value, CAST('0.95' AS DOUBLE)), 6) AS p95
       |FROM keep GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- deterministic set-operation sketch: KMV bottom-k -----------------

  /** KMV sketch size. 256 keeps the union/intersection estimates within
    * ~1/√k ≈ 6% relative error (gated empirically in SketchSpec) while
    * staying far below the sf0.01 set sizes (~1600), so the ESTIMATOR
    * branch — not the exact-small-set branch — is what the driver's
    * oracle gates. */
  val KmvK = 256

  /** Set-operation sketch: per event type, the k-minimum-values sketch
    * (Bar-Yossef et al. 2002; the theta-sketch family) of the type's
    * ACTIVITY SET — distinct (user, epoch-day) pairs — and, per type
    * pair, union / intersection / Jaccard ESTIMATES with the exact values
    * alongside. This is the set-operation gap [[hllUsers]] leaves: HLL
    * registers union (max) but cannot intersect; KMV sketches support
    * both, because the bottom-k hashes are a uniform coordinated sample
    * of the set — the k-th minimum θ estimates density ((k−1)·2⁶⁰/θ
    * distincts), and membership of the union sample in both sets
    * estimates overlap. Merge of two KMV sketches = bottom-k of their
    * union: every value kept globally is ≤ its own sketch's θ, so the
    * merged k-smallest are fully covered by both inputs — the same
    * union-then-retruncate mergeability as [[graft.operators.TopK.
    * perGroupBottomS]] (whose map-side-truncating aggregator builds the
    * per-type sketches here).
    *
    * Exactness contract: hashes and ranks are integer; the only float
    * steps are the final estimate divisions — est_union = one
    * correctly-rounded division of two exactly-representable doubles
    * (255·2⁶⁰ has an 8-bit mantissa; θ < 2⁶⁰ is an exact Long→double),
    * est_inter = one multiplication then an EXACT /256 (dyadic) — so
    * both engines round identically and the entry is hash-gated, the
    * [[hllUsers]] precedent. When the union sample holds fewer than k
    * values both sketches were exhaustive and the exact branch serves.
    *
    * Scale shape: one distinct aggregate over (type, hash) — the one
    * corpus-sized shuffle, map-side combinable — then the bounded
    * bottom-k truncation; everything downstream touches ≤ types·k rows.
    * Exact comparison sets exist only in the spec-gated audit twin
    * [[kmvSets]] — the registered serving entry carries no validation
    * ballast. */
  private[graft] def kmvElements(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      concat(col("user_id").cast("string"), lit(":"),
        expr(s"ts div $DayNs").cast("string")).as("e"))

  /** Per-type bottom-[[KmvK]] sketch: (event_type, h) with h the salted
    * md5-60 of the element — ≤ k rows per type, kept map-side. */
  private[graft] def kmvSketches(ev: DataFrame): DataFrame =
    graft.operators.TopK.perGroupBottomS(
      kmvElements(ev)
        .select(col("event_type"),
          graft.dedup.Dedup.hash60(concat(lit("kmv:"), col("e"))).as("h"))
        .distinct()
        .select(col("event_type"), col("h"), lit(0.0).as("v")),
      "event_type", col("h"), col("v"), KmvK)
      .select(col("event_type"), col("pri").as("h"))

  /** Estimator-only KMV set-operation serving — what `q_kmv_sets`
    * registers and the bench times: sketch → pairwise merged bottom-k →
    * union/intersection/Jaccard estimates. The exact-comparison columns
    * the entry previously carried were validation ballast (two more
    * corpus-distinct aggregates + a full element-set pair join) that a
    * production serve never runs; they now live only in the spec-gated
    * audit twin [[kmvSets]] (SketchSpec gates the estimates against
    * exact sets at sf0.01). */
  def kmvSetsServing(spark: SparkSession, dir: String): DataFrame =
    kmvEstimates(graft.model.VectorModel.events(spark, dir))
      .orderBy("type_a", "type_b")

  private def kmvEstimates(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the sketch feeds TWO pair-side joins below — cache it
    // (CacheRegistry) or each join re-runs its distinct aggregate from
    // the raw events (the recurring shared-lineage class)
    val sk = graft.store.CacheRegistry.cached(kmvSketches(ev))
    val types = sk.select("event_type").distinct()
    val pairs = broadcast(types.select(col("event_type").as("ta"))
      .crossJoin(types.select(col("event_type").as("tb")))
      .where(col("ta") < col("tb")))
    // union-sample membership: one row per (pair, h), flagged per side
    val members = pairs.join(sk, col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(sk, col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ta", "tb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    // bottom-k of the merged sketch; window is fine — ≤ 2k rows per pair
    val kept = members
      .withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .where(col("rn") <= KmvK)
    val agg = kept.groupBy("ta", "tb").agg(
      count(lit(1)).as("nu"),
      max("h").as("theta"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("c"))
    val euRaw = lit((KmvK - 1).toDouble) * lit(math.pow(2.0, 60)) /
      col("theta").cast("double")
    agg.select(
      col("ta").as("type_a"), col("tb").as("type_b"),
      when(col("nu") >= KmvK, round(euRaw, 6))
        .otherwise(col("nu").cast("double")).as("est_union"),
      when(col("nu") >= KmvK,
        round(col("c").cast("double") * euRaw / KmvK.toDouble, 6))
        .otherwise(col("c").cast("double")).as("est_inter"),
      when(col("nu") >= KmvK,
        round(col("c").cast("double") / KmvK.toDouble, 6))
        .otherwise(round(col("c").cast("double") / col("nu").cast("double"), 6))
        .as("est_jaccard"))
  }

  /** Audit twin of [[kmvSetsServing]]: the estimates JOINED with exact
    * union/intersection over the full distinct element sets. Spec-gated
    * only (SketchSpec's sampling-error bounds) — deliberately NOT a
    * registered entry, so the bench measures the operator, not its
    * audit. */
  def kmvSets(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.model.VectorModel.events(spark, dir)
    val pairsEst = kmvEstimates(ev)
    val el = graft.store.CacheRegistry.cached(kmvElements(ev).distinct())
    val types = el.select("event_type").distinct()
    val pairs = broadcast(types.select(col("event_type").as("ta"))
      .crossJoin(types.select(col("event_type").as("tb")))
      .where(col("ta") < col("tb")))
    val exact = pairs.join(el, col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("e"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(pairs.join(el, col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("e"), lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy("ta", "tb", "e")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .groupBy("ta", "tb").agg(
        count(lit(1)).as("exact_union"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("exact_inter"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("exact_union"), col("exact_inter"))
    pairsEst.join(exact, Seq("type_a", "type_b"))
      .orderBy("type_a", "type_b")
  }

  lazy val kmvSetsSql: String = {
    val k = KmvK
    val euRaw = s"(CAST(${k - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)" +
      s" / CAST(theta AS DOUBLE))"
    s"""WITH el AS (SELECT DISTINCT event_type,
       |    CAST(user_id AS VARCHAR)||':'||CAST(epoch_ns(ts) // $DayNs AS VARCHAR) AS e
       |  FROM events),
       |hs AS (SELECT DISTINCT event_type,
       |    ('0x'||substr(md5('kmv:'||e),1,15))::BIGINT AS h FROM el),
       |sk AS (SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM hs) WHERE rn <= $k),
       |ty AS (SELECT DISTINCT event_type FROM el),
       |pairs AS (SELECT x.event_type AS ta, y.event_type AS tb
       |  FROM ty x JOIN ty y ON x.event_type < y.event_type),
       |m AS (SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk s ON s.event_type = p.ta
       |    UNION ALL
       |    SELECT p.ta, p.tb, s.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN sk s ON s.event_type = p.tb
       |  ) GROUP BY ta, tb, h),
       |kept AS (SELECT * FROM (
       |    SELECT ta, tb, h, in_a, in_b,
       |      row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |    FROM m) WHERE rn <= $k),
       |agg AS (SELECT ta, tb, count(*) AS nu, max(h) AS theta,
       |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS c
       |  FROM kept GROUP BY ta, tb)
       |SELECT agg.ta AS type_a, agg.tb AS type_b,
       |  CASE WHEN nu >= $k THEN round($euRaw, 6)
       |    ELSE CAST(nu AS DOUBLE) END AS est_union,
       |  CASE WHEN nu >= $k
       |    THEN round(CAST(c AS DOUBLE) * $euRaw / CAST(${k} AS DOUBLE), 6)
       |    ELSE CAST(c AS DOUBLE) END AS est_inter,
       |  CASE WHEN nu >= $k THEN round(CAST(c AS DOUBLE) / CAST($k AS DOUBLE), 6)
       |    ELSE round(CAST(c AS DOUBLE) / CAST(nu AS DOUBLE), 6) END AS est_jaccard
       |FROM agg
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** ROLLUP hierarchy totals (null group keys coalesced to 'ALL'). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Time-series densify + gap-fill: per user, EVERY hour between their
    * first and last event — missing hours appear with n = 0 and the last
    * observed hourly revenue carried forward (`last … ignoreNulls`, the
    * gauge-style fill a feature pipeline wants before it windows over a
    * regular grid). The hour grid is a per-row `sequence()` explode off
    * the per-user min/max (no driver state, no cross join); the fill is
    * one per-user ordered window. Money through the cents cast. */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = graft.model.VectorModel.events(spark, dir)
      .withColumn("hour", expr("ts div 3600000000000")) // ns per hour
      .groupBy("user_id", "hour")
      .agg(count(lit(1)).as("n_raw"),
        sum(round(col("value") * 100.0).cast("long")).as("cents_raw"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        last(col("cents_raw"), ignoreNulls = true).over(w).as("cents_ffill"))
      .orderBy("user_id", "hour")
  }

  val eventsGapfillSql: String =
    """WITH hourly AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
      |    count(*) AS n_raw,
      |    CAST(sum(CAST(round(value*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cents_raw
      |  FROM events GROUP BY user_id, hour),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(min(hour), max(hour))) AS hour
      |  FROM hourly GROUP BY user_id)
      |SELECT g.user_id AS user_id, g.hour AS hour,
      |  CAST(coalesce(h.n_raw, 0) AS BIGINT) AS n,
      |  last_value(h.cents_raw IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hour
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill
      |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
      |ORDER BY user_id, hour""".stripMargin

  /** Semi-structured extraction: the events table's `props` column is a
    * JSON string; pull a typed field out per row and aggregate on it —
    * the get_json_object/schema-on-read shape every log pipeline runs.
    * Extraction is a codegen'd path expression (no UDF, no full JSON
    * parse into a struct column the query doesn't need); the aggregate
    * buckets k to keep the output bounded at any SF. */
  def eventsJsonProps(spark: SparkSession, dir: String): DataFrame =
    // Par-widened: the small events file scans as one split, and the
    // per-row work here is a full JSON parse — the serial-stage shape
    graft.operators.Par.widen(graft.model.VectorModel.events(spark, dir))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type", "k_mod")

  val eventsJsonPropsSql: String =
    """SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1, 2 ORDER BY event_type, k_mod""".stripMargin

  /** Pivot (long → wide): revenue cents by return flag, one column per
    * line status — the DataFrame `pivot` API with EXPLICIT pivot values
    * (the scale rule: value discovery is an extra full scan + a driver
    * collect; a 100 TB pivot declares its columns). Money through the
    * cents-as-BIGINT cast, so every cell is exact integer arithmetic. */
  val PivotStatuses = Seq("F", "O")

  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("cents",
        round(col("l_extendedprice") * 100.0).cast("long"))
      .groupBy("l_returnflag")
      .pivot("l_linestatus", PivotStatuses)
      .agg(sum(col("cents")))
      .orderBy("l_returnflag")

  val pivotAggSql: String = {
    val cells = PivotStatuses.map(s =>
      s"""CAST(sum(CASE WHEN l_linestatus = '$s'
         |    THEN CAST(round(l_extendedprice*CAST('100.0' AS DOUBLE)) AS BIGINT) END)
         |  AS BIGINT) AS "$s"""".stripMargin).mkString(",\n  ")
    s"""SELECT l_returnflag, $cells
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Z-ordered lineitem layout clustered on (l_partkey, l_suppkey) —
    * build-once/serve-many like every index layout; 32 files, each a
    * compact box in key space ([[graft.operators.ZOrder]]). */
  private[graft] def zorderLayout(spark: SparkSession, dir: String): String =
    zorderLayoutCache.computeIfAbsent(dir, _ => {
      val p = graft.store.Fs.scratchDir(spark, "graft_zorder") + "/lineitem"
      graft.operators.ZOrder.writeClustered(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        p, "l_partkey", "l_suppkey", bits = 16, numFiles = 32)
      p
    })

  private val zorderLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Two-dimensional box aggregate served from the z-ordered layout: the
    * predicate reaches the parquet scan as pushed min/max filters, and
    * because every file is a compact (partkey, suppkey) box, most files
    * prune on their footer stats alone — no index, no query-side
    * cooperation (ZOrderSpec measures the pruning vs a lexicographic
    * sort). Values are layout-independent, so the oracle runs the same
    * aggregate over the plain table — the gate proves clustering changed
    * NOTHING but the physical order. */
  def zorderBox(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(zorderLayout(spark, dir))
      .where(col("l_partkey") <= 400 && col("l_suppkey") <= 40)
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100.0).cast("long")).as("cents"))

  val zorderBoxSql: String =
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice*CAST('100.0' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS cents
      |FROM lineitem WHERE l_partkey <= 400 AND l_suppkey <= 40""".stripMargin

  /** SQL entry surface: the engine accepts SQL text over registered views
    * (with graft extensions available, e.g. cosine_sim). Same relational
    * result as a DataFrame plan — the point is the spark.sql path. */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("li_sql")
    spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM li_sql WHERE l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem WHERE l_discount > CAST('0.05' AS DOUBLE)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_surface" -> (sqlSurface _),
    "q_count_distinct" -> (countDistinct_ _),
    "q_join_types" -> (joinTypes _),
    "ev_funnel" -> (eventsFunnel _),
    "ev_gapfill" -> (eventsGapfill _),
    "q_pivot" -> (pivotAgg _),
    "q_zorder_box" -> (zorderBox _),
    "ev_props_json" -> (eventsJsonProps _),
    "ev_running" -> (eventsRunning _),
    "q_rollup" -> (rollupAgg _),
    "q_set_ops" -> (setOps _),
    "q_scalar_funcs" -> (scalarFuncs _),
    "ev_asof_orders" -> (eventsAsOfOrders _),
    "ev_range_join" -> (eventsRangeJoinIncidents _),
    "q_approx_users" -> (approxUsers _),
    "q_hll_users" -> (hllUsers _),
    "q_heavy_hitters" -> (heavyHitters _),
    "q_quantile_sketch" -> (quantileSketch _),
    "q_kmv_sets" -> (kmvSetsServing _),
    "q_percentiles" -> (valuePercentiles _),
    "q1_agg" -> (q1Agg _),
    "q3_join_topk" -> (q3JoinTopK _),
    "ev_window_topk" -> (eventsWindowTopK _),
    "ev_hourly_agg" -> (eventsHourlyAgg _),
    "ev_retention" -> (eventsRetention _),
    "ev_sessions" -> (eventsSessions _))

  val oracleSql: Map[String, String] = Map(
    "q_sql_surface" -> sqlSurfaceSql,
    "q_count_distinct" -> countDistinctSql,
    "q_join_types" -> joinTypesSql,
    "ev_funnel" -> eventsFunnelSql,
    "ev_gapfill" -> eventsGapfillSql,
    "q_pivot" -> pivotAggSql,
    "q_zorder_box" -> zorderBoxSql,
    "ev_props_json" -> eventsJsonPropsSql,
    "ev_running" -> eventsRunningSql,
    "q_rollup" -> rollupAggSql,
    "q_set_ops" -> setOpsSql,
    "q_scalar_funcs" -> scalarFuncsSql,
    "ev_asof_orders" -> eventsAsOfOrdersSql,
    "ev_range_join" -> eventsRangeJoinIncidentsSql,
    "q_hll_users" -> hllUsersSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_quantile_sketch" -> quantileSketchSql,
    "q_kmv_sets" -> kmvSetsSql,
    "q_percentiles" -> valuePercentilesSql,
    "q1_agg" -> q1AggSql,
    "q3_join_topk" -> q3JoinTopKSql,
    "ev_window_topk" -> eventsWindowTopKSql,
    "ev_hourly_agg" -> eventsHourlyAggSql,
    "ev_retention" -> eventsRetentionSql,
    "ev_sessions" -> eventsSessionsSql)
}
