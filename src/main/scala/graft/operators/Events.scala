package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num.{dbl, dec}
import graft.sources.Tables

/** Time-series operators over the `events` table: tumbling and sliding
  * event-time windows and gaps-and-islands sessionization. The window
  * transforms are the SAME functions the streaming path uses
  * ([[graft.streaming.Streams]] — Spark's unified batch/stream API), so
  * the DuckDB oracle gates the streaming semantics too (for closed
  * windows; the streaming test pins batch≡stream equivalence).
  *
  * Determinism: event `value` sums are done in DECIMAL(18,4) (exact,
  * order-independent — double sums would vary with partitioning);
  * event-time gaps compare epoch MICROSECONDS as integers (interval
  * arithmetic differs subtly across engines; integer µs do not).
  */
object Events {
  val SessionGapMin = 30L

  /** Tumbling 1-hour windows per event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), dbl(col("sv")).as("sum_value"))

  def qTumbling(s: SparkSession, dir: String): DataFrame =
    tumbling(Tables.events(s, dir)).orderBy("w_start", "event_type")

  def qTumblingSql: String =
    """SELECT date_trunc('hour', ts) AS w_start, event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Sliding 2-hour windows advancing hourly, per event_type: each event
    * lands in exactly two windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), dbl(col("sv")).as("sum_value"))

  def qSliding(s: SparkSession, dir: String): DataFrame =
    sliding(Tables.events(s, dir)).orderBy("w_start", "event_type")

  def qSlidingSql: String =
    """WITH expanded AS (
      |  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start,
      |         event_type, value
      |  FROM events)
      |SELECT w_start, event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM expanded
      |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  /** Batch sessionization: classic gaps-and-islands — a new session starts
    * after a > 30 min silence per user. Single shuffle on user_id; both
    * window functions reuse the same partitioning. The streaming
    * equivalent ([[graft.streaming.Streams.sessionize]]) holds the open
    * session in keyed state instead of looking backward. */
  def sessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = SessionGapMin * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), dbl(sum(dec(col("value")))).as("sum_value"))
  }

  def qSessions(s: SparkSession, dir: String): DataFrame =
    sessions(Tables.events(s, dir)).orderBy("user_id", "sid")

  /** Semi-structured `props` (a JSON string column): schema-on-read
    * extraction with a DECLARED schema (`from_json` — codegen'd parse,
    * no UDF; unexpected shapes surface as NULLs, not exceptions), then a
    * grouped aggregate over the extracted field. The engine-grade point:
    * JSON stays a column until the projection needs a field, so column
    * pruning still skips the whole string when a query doesn't touch it. */
  val propsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))

  def propsAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        countDistinct("k").as("n_k"))

  def qProps(s: SparkSession, dir: String): DataFrame =
    // explicit NULLS LAST: Spark ASC defaults nulls-first, DuckDB
    // nulls-last — on dirty props (NULL k_bucket group) the two faces
    // would otherwise order rows differently
    propsAgg(Tables.events(s, dir))
      .orderBy(col("event_type"), col("k_bucket").asc_nulls_last)

  def qPropsSql: String =
    // json_valid + TRY_CAST mirror the Spark degradation contract
    // (malformed JSON / non-integer k -> NULL): DuckDB's bare `->>`
    // hard-errors on bad JSON where from_json yields NULL, so without
    // the guard the two faces of this query would diverge on dirty data
    """WITH x AS (
      |  SELECT event_type,
      |         CASE WHEN json_valid(props)
      |              THEN TRY_CAST(props->>'$.k' AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, k % 10 AS k_bucket, COUNT(*) AS n,
      |       CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(DISTINCT k) AS n_k
      |FROM x GROUP BY 1, 2 ORDER BY event_type, k_bucket NULLS LAST""".stripMargin

  val RollingMin = 5L

  /** Per-event trailing 5-minute activity for the same user: a
    * VALUE-RANGE window frame (`RANGE BETWEEN 300s PRECEDING AND CURRENT
    * ROW` over epoch-µs), not a rows frame — the frame is defined by the
    * timestamp value, so co-timestamped events all see each other and the
    * result is deterministic under ties with no tiebreak column needed.
    * One shuffle on user_id; the frame is evaluated incrementally by
    * WindowExec (running add/remove), not rebuilt per row. */
  def rolling(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rangeUs = RollingMin * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-rangeUs, 0)
    events.select(col("event_id"), col("user_id"), col("ts"),
      count(lit(1)).over(w).as("n_5min"),
      dbl(sum(dec(col("value"))).over(w)).as("sum_5min"))
  }

  def qRolling(s: SparkSession, dir: String): DataFrame =
    rolling(Tables.events(s, dir)).orderBy("event_id")

  def qRollingSql: String = {
    val rangeUs = RollingMin * 60L * 1000000L
    s"""SELECT event_id, user_id, ts,
       |       COUNT(*) OVER w AS n_5min,
       |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_5min
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |             RANGE BETWEEN $rangeUs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin
  }

  /** Ordered-sequence funnel: signup -> click -> purchase per user, each
    * stage strictly after a completed earlier stage. The sequential
    * dependency ("a click counts only after a signup") is resolved in ONE
    * window pass: all three running-min columns share the same
    * (partition, ordering), so Spark plans a single sort + WindowExec —
    * one shuffle on user_id total, and the per-user aggregate that
    * follows reuses that partitioning. The naive formulation (three
    * chained filtered aggregates with join-backs) costs 3 keyed shuffles
    * and 3 joins for identical output.
    *
    * Strictly-after is the frame [unboundedPreceding, -1] over rows
    * ordered by (epoch-µs, event_id): a click co-timestamped with its
    * signup qualifies iff its event_id is greater — deterministic under
    * ties in both engines. */
  val FunnelStages: Seq[String] = Seq("signup", "click", "purchase")

  /** Per-user earliest stage times (epoch-µs): t1 = first signup, t2 =
    * first click strictly after a signup, t3 = first purchase strictly
    * after a qualifying click. The streaming dual
    * ([[graft.streaming.Streams.funnelStages]]) reproduces exactly these
    * stage hits from buffered state; StreamingSpec pins the equivalence. */
  def funnelUsers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin(FunnelStages: _*))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("s_us", when(col("event_type") === "signup", col("us")))
      .withColumn("s1p", min("s_us").over(wPrev))
      .withColumn("c_us",
        when(col("event_type") === "click" && col("s1p").isNotNull, col("us")))
      .withColumn("c1p", min("c_us").over(wPrev))
      .withColumn("p_us",
        when(col("event_type") === "purchase" && col("c1p").isNotNull, col("us")))
      .groupBy("user_id")
      .agg(min("s_us").as("t1"), min("c_us").as("t2"), min("p_us").as("t3"))
  }

  def funnel(events: DataFrame): DataFrame = {
    val perUser = funnelUsers(events)
    perUser.agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .select(expr(
        """stack(3,
          |  1, 'signup',   n1, CAST(NULL AS DOUBLE),
          |  2, 'click',    n2, CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END,
          |  3, 'purchase', n3, CASE WHEN n2 > 0 THEN CAST(n3 AS DOUBLE) / n2 END
          |) AS (stage, stage_name, n_users, conversion)""".stripMargin))
  }

  def qFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(s, dir)).orderBy("stage")

  def qFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |         CASE WHEN event_type = 'signup' THEN epoch_us(ts) END AS s_us
      |  FROM events WHERE event_type IN ('signup', 'click', 'purchase')),
      |s1 AS (
      |  SELECT *, MIN(s_us) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s1p
      |  FROM e),
      |c1 AS (
      |  SELECT *, CASE WHEN event_type = 'click' AND s1p IS NOT NULL
      |                 THEN us END AS c_us
      |  FROM s1),
      |c2 AS (
      |  SELECT *, MIN(c_us) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c1p
      |  FROM c1),
      |p1 AS (
      |  SELECT *, CASE WHEN event_type = 'purchase' AND c1p IS NOT NULL
      |                 THEN us END AS p_us
      |  FROM c2),
      |u AS (
      |  SELECT user_id, MIN(s_us) AS t1, MIN(c_us) AS t2, MIN(p_us) AS t3
      |  FROM p1 GROUP BY user_id),
      |tot AS (
      |  SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3 FROM u)
      |SELECT * FROM (
      |  SELECT 1 AS stage, 'signup' AS stage_name, n1 AS n_users,
      |         CAST(NULL AS DOUBLE) AS conversion FROM tot
      |  UNION ALL
      |  SELECT 2, 'click', n2,
      |         CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END FROM tot
      |  UNION ALL
      |  SELECT 3, 'purchase', n3,
      |         CASE WHEN n2 > 0 THEN CAST(n3 AS DOUBLE) / n2 END FROM tot)
      |ORDER BY stage""".stripMargin

  /** CDC-log apply: read `events` as a change-data-capture stream on
    * user entities (signup = insert, click/view/purchase = value update,
    * error = delete tombstone) and materialize the final state — the
    * batch half of every warehouse's MERGE-from-binlog path, and the
    * semantics the reference's keyed upsert (`/root/reference/src/etl.py:36-46`)
    * degenerates to when the log carries only upserts.
    *
    * Last-write-wins is computed with a commutative `max(struct(ts,
    * event_id, op, value))` AGGREGATE, not a `row_number` window: the
    * aggregate combines map-side, so each partition contributes one
    * candidate row per key to the shuffle, where the window would
    * shuffle and sort the ENTIRE log. At a 100 TB log with a bounded key
    * space, that is the difference between shuffling |keys| rows and
    * shuffling |log| rows. A key whose LAST op is a tombstone is absent
    * from the final state; a re-insert after a delete correctly
    * resurrects it (the tombstone loses the max). event_id breaks ts
    * ties identically in both engines. */
  def cdcApply(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D").otherwise("U")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        op.as("op"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ops"),
        sum(when(col("op") === "D", 1).otherwise(0)).as("n_deletes"),
        max(struct(col("ts"), col("event_id"), col("op"), col("value")))
          .as("last"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.value").as("last_value"), col("n_ops"),
        col("n_deletes"))
  }

  def qCdc(s: SparkSession, dir: String): DataFrame =
    cdcApply(Tables.events(s, dir)).orderBy("user_id")

  def qCdcSql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN event_type = 'signup' THEN 'I'
      |              WHEN event_type = 'error' THEN 'D'
      |              ELSE 'U' END AS op
      |  FROM events),
      |r AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
      |         SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id) AS n_deletes
      |  FROM c)
      |SELECT user_id, ts AS last_ts, value AS last_value,
      |       CAST(n_ops AS BIGINT) AS n_ops,
      |       CAST(n_deletes AS BIGINT) AS n_deletes
      |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY user_id""".stripMargin

  /** Baseline frame: previous [[SpikeFrame]] observed hours. */
  val SpikeFrame = 24
  /** Minimum observed baseline hours before a z-score is emitted. */
  val SpikeMinBaseline = 12
  val SpikeZ = 3.0

  /** Event-rate spike detection: hourly counts per event_type scored
    * against a trailing baseline of the previous [[SpikeFrame]] observed
    * hours (rows-frame, so calendar gaps don't silently shrink the
    * window to nothing — the baseline is "last 24 observations",
    * documented as such). The z-score machinery is the robust-ops
    * family's (kpi_anomalies) transplanted to time series: same keyed
    * window, same determinism discipline. Variance comes from exact
    * integer sums (w·Σc² − (Σc)² over BIGINT counts — never a running
    * double), so mean/std/z are each a single IEEE op chain evaluated
    * in the same order in both engines. Fewer than [[SpikeMinBaseline]]
    * baseline hours → NULL z (cold start is not a spike). Scale shape:
    * one keyed agg (type, hour) over the scan, one dim×hours window —
    * the window partition is |event_type|, each holding |hours| rows,
    * never raw events. */
  def spikes(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-SpikeFrame, -1)
    val w = count(col("n")).over(frame)
    val s1 = sum(col("n")).over(frame)
    val s2 = sum(col("n") * col("n")).over(frame)
    val mean = s1.cast("double") / w
    val varNum = w * s2 - s1 * s1
    val std = sqrt(varNum.cast("double") / (w * w).cast("double"))
    val z = when(w >= SpikeMinBaseline && std > 0.0,
      (col("n").cast("double") - mean) / std)
    hourly
      .withColumn("baseline_hours", w)
      .withColumn("baseline_mean", when(w >= SpikeMinBaseline, mean))
      .withColumn("baseline_std", when(w >= SpikeMinBaseline, std))
      .withColumn("z", z)
      .withColumn("spike", coalesce(col("z") > SpikeZ, lit(false)))
  }

  def qSpikes(s: SparkSession, dir: String): DataFrame =
    spikes(Tables.events(s, dir)).orderBy("event_type", "hour")

  def qSpikesSql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |win AS (
       |  SELECT event_type, hour, n,
       |         COUNT(n) OVER f AS w,
       |         SUM(n) OVER f AS s1,
       |         SUM(n * n) OVER f AS s2
       |  FROM hourly
       |  WINDOW f AS (PARTITION BY event_type ORDER BY hour
       |               ROWS BETWEEN $SpikeFrame PRECEDING AND 1 PRECEDING)),
       |scored AS (
       |  SELECT event_type, hour, n, w,
       |         CAST(s1 AS DOUBLE) / w AS mean,
       |         sqrt(CAST(w * s2 - s1 * s1 AS DOUBLE) / CAST(w * w AS DOUBLE)) AS std
       |  FROM win)
       |SELECT event_type, hour, n,
       |       CAST(w AS BIGINT) AS baseline_hours,
       |       CASE WHEN w >= $SpikeMinBaseline THEN mean END AS baseline_mean,
       |       CASE WHEN w >= $SpikeMinBaseline THEN std END AS baseline_std,
       |       CASE WHEN w >= $SpikeMinBaseline AND std > 0.0
       |            THEN (CAST(n AS DOUBLE) - mean) / std END AS z,
       |       COALESCE(CASE WHEN w >= $SpikeMinBaseline AND std > 0.0
       |                     THEN (CAST(n AS DOUBLE) - mean) / std END > $SpikeZ,
       |                FALSE) AS spike
       |FROM scored ORDER BY event_type, hour""".stripMargin

  def qSessionsSql: String = {
    val gapUs = SessionGapMin * 60L * 1000000L
    s"""WITH lagd AS (
       |  SELECT user_id, event_id, ts, value,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM events),
       |flags AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $gapUs
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM lagd),
       |sess AS (
       |  SELECT *, CAST(SUM(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS INT) AS sid
       |  FROM flags)
       |SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin
  }

  /** Daily new-vs-returning decomposition + cumulative distinct users —
    * the growth-accounting view every product-analytics stack derives
    * from its event log. A user is "new" on the day of their first event
    * ever; `cum_users` (total distinct users to date) is the running sum
    * of daily new users — computing it this way replaces a per-day
    * COUNT(DISTINCT) over an ever-growing prefix (quadratic re-scan, or
    * an OOM-prone distinct-within-window) with two linear passes.
    *
    * Scale shape: (1) the raw log collapses to (day, user) in ONE keyed
    * map-side-combinable aggregate — the only shuffle that carries the
    * log; (2) first-day flags come from a user-partitioned window over
    * that collapsed frame (|users|·|active days| rows, spillable sort);
    * (3) the daily rollup is calendar-sized, and the final running sum
    * is a single-partition window over those ~|days| rows — the same
    * dim-sized-window pattern as kpi_trend, never raw data. */
  def newUsers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val activity = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day", "user_id").agg(count(lit(1)).as("n_events"))
    val flagged = activity.withColumn("first_day",
      min(col("day")).over(Window.partitionBy("user_id")))
    val daily = flagged.groupBy("day")
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"),
        sum(col("n_events")).as("n_events"))
    daily
      .withColumn("returning_users", col("active_users") - col("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def qNewUsers(s: SparkSession, dir: String): DataFrame =
    newUsers(Tables.events(s, dir)).orderBy("day")

  def qNewUsersSql: String =
    """WITH activity AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |flagged AS (
      |  SELECT *, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM activity),
      |daily AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS active_users,
      |         CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
      |         CAST(SUM(n_events) AS BIGINT) AS n_events
      |  FROM flagged GROUP BY day)
      |SELECT day, active_users, new_users, n_events,
      |       active_users - new_users AS returning_users,
      |       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM daily ORDER BY day""".stripMargin

  /** First-order transition matrix over each user's event sequence (the
    * Markov view of user journeys — what follows what, and with what
    * probability). ONE user-keyed lag window over the log produces the
    * (prev, next) stream; the matrix is a |types|² aggregate and the
    * row-normalization a |types|²-sized window — raw events never enter
    * a second shuffle. Co-timestamped events order by event_id (same
    * tiebreak as sessions/funnel). */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val matrix = pairs
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    matrix.withColumn("p", col("n").cast("double")
      / sum(col("n")).over(Window.partitionBy("prev_type")))
  }

  def qTransitions(s: SparkSession, dir: String): DataFrame =
    transitions(Tables.events(s, dir)).orderBy("prev_type", "next_type")

  def qTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |t AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      |FROM t ORDER BY prev_type, next_type""".stripMargin

  /** SLO error budget: 2.5% expressed as an exact integer ratio —
    * breach iff errors·[[SloDen]] > [[SloErrNum]]·total, so the gate
    * decision never touches a float (the reported err_rate double is
    * display-only). */
  val SloErrNum = 25L
  val SloDen = 1000L

  /** Hourly SLO breach report: per hour, total events, error events,
    * error rate, and an EXACT breach decision by cross-multiplication.
    * One conditional-arm aggregate over the scan (the [[tumbling]]
    * shape); at 100 TB this is the alerting rollup a monitoring
    * pipeline materializes continuously — the streaming face is the
    * same aggregate under a watermark. */
  def slo(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .withColumn("err_rate", col("n_errors").cast("double") / col("n"))
      .withColumn("breach", col("n_errors") * SloDen > lit(SloErrNum) * col("n"))

  def qSlo(s: SparkSession, dir: String): DataFrame =
    slo(Tables.events(s, dir)).orderBy("hour")

  def qSloSql: String =
    s"""SELECT date_trunc('hour', ts) AS hour,
       |       COUNT(*) AS n,
       |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS err_rate,
       |       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * $SloDen > $SloErrNum * COUNT(*) AS breach
       |FROM events GROUP BY 1 ORDER BY hour""".stripMargin

  /** Trailing window width for [[wau]] (days). */
  val WauDays = 7

  /** DAU / trailing-7-day WAU / stickiness per day. The trailing
    * distinct count is NOT a window distinct (unsupported, and a naive
    * per-day re-count scans the window k times): each (day, user)
    * activity row is exploded to the [[WauDays]] observation days it
    * makes that user "weekly active" for, deduped, and counted — two
    * linear passes with a bounded ×7 fan-out of the already-collapsed
    * activity frame, never of the raw log.
    *
    * Scale shape: the raw log collapses to distinct (day, user) in ONE
    * keyed shuffle; the exploded frame is 7×|activity| (users × active
    * days, not events) and its dedup+count are map-side combinable.
    * Reported days are days WITH activity (inner join) — trailing
    * windows over silent days are a gap-fill concern (kpi_gapfill). */
  def wau(events: DataFrame): DataFrame = {
    val act = events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
    val weekly = act
      .select(explode(sequence(col("day"), date_add(col("day"), WauDays - 1)))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(weekly, "day")
      .withColumn("stickiness", col("dau").cast("double") / col("wau"))
  }

  def qWau(s: SparkSession, dir: String): DataFrame =
    wau(Tables.events(s, dir)).orderBy("day")

  def qWauSql: String =
    s"""WITH act AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       |dau AS (SELECT day, COUNT(*) AS dau FROM act GROUP BY day),
       |obs AS (
       |  SELECT DISTINCT day + CAST(i AS INT) AS day, user_id
       |  FROM act, unnest(range(0, $WauDays)) AS t(i)),
       |wk AS (SELECT day, COUNT(*) AS wau FROM obs GROUP BY day)
       |SELECT day, dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
       |FROM dau JOIN wk USING (day) ORDER BY day""".stripMargin

  /** Touch channels eligible for conversion credit. `error` events are
    * noise, and a purchase cannot credit another purchase. */
  val TouchTypes: Seq[String] = Seq("click", "signup", "view")

  /** Last-touch conversion attribution: every `purchase` credits the
    * most recent PRECEDING touch event (click/signup/view) of the same
    * user — ties on ts break by event_id, purchases with no prior touch
    * credit `direct`. The marketing-analytics dual of the funnel: the
    * funnel asks how far users progress, attribution asks which channel
    * gets revenue credit.
    *
    * Scale shape: ONE user-keyed window pass carries the running last
    * touch via `last_value(ignoreNulls)` over an unbounded-preceding
    * frame — no self-join of purchases against touches (the naive
    * formulation joins every purchase to ALL its user's earlier events
    * and re-sorts per pair); the channel rollup is |channels|-sized.
    * Same single-shuffle shape as sessionization. */
  def attribution(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touched = events.withColumn("channel",
      last(when(col("event_type").isin(TouchTypes: _*), col("event_type")),
        ignoreNulls = true).over(w))
    touched.filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        dbl(sum(dec(col("value")))).as("sum_value"))
  }

  def qAttribution(s: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(s, dir)).orderBy("channel")

  def qAttributionSql: String = {
    val touch = TouchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (
       |  SELECT *, last_value(CASE WHEN event_type IN ($touch) THEN event_type END IGNORE NULLS)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS channel
       |  FROM events)
       |SELECT COALESCE(channel, 'direct') AS channel,
       |       COUNT(*) AS n_purchases,
       |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM t WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY channel""".stripMargin
  }
}
