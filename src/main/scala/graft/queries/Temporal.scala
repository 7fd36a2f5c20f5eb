package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, RangeJoin, Sessions}

/** Event-time operators over the events table: tumbling-window
  * aggregation and gap sessionization. Both are the BATCH forms of the
  * engine's streaming operators (graft.streaming.Windows /
  * graft.operators.Sessions) — same functions, same results — so the
  * DuckDB check verifies the semantics the streaming path shares.
  */
object Temporal {
  import Tables.t

  /** Epoch-micros event time (events.parquet is nanos → BIGINT). */
  private val tsUs = expr("ts div 1000")
  private val OracleTsUs = "CAST(epoch_ns(ts) // 1000 AS BIGINT)"

  // W2 — tumbling-window aggregation (Spark `window()`; epoch-aligned
  // 1-hour buckets) with per-type counts and cent-exact value sums.
  // Same plan fragment as the streaming path (graft.streaming.Windows).
  def windowedAgg(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Windows.tumblingTypeAgg(
        t(s, dir, "events").withColumn("ts_ts", timestamp_micros(tsUs)), "ts_ts")
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start", "event_type")

  // time_bucket with an epoch-aligned origin reproduces Spark's
  // epoch-aligned tumbling windows; truncation ns→us matches `ts div 1000`.
  val windowedAggSql: String =
    s"""SELECT strftime(time_bucket(INTERVAL '1 hour',
       |         make_timestamp($OracleTsUs), TIMESTAMP '1970-01-01 00:00:00'),
       |         '%Y-%m-%d %H:%M:%S') AS window_start,
       |       event_type,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // W6 — SLIDING windows (1 h length, 15 min slide): each event lands
  // in 4 overlapping windows. Spark's window() emits the per-event
  // window set as a projection (no self-join); the oracle replays it by
  // unnesting the 4 candidate starts per event and keeping those whose
  // window contains the event — provably the same set.
  def slidingWindowAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_ts", timestamp_micros(tsUs))
      .groupBy(window(col("ts_ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("value_cents"))
      .orderBy("window_start", "event_type")

  val slidingWindowAggSql: String =
    s"""WITH ev AS (SELECT $OracleTsUs AS ts_us, event_type,
       |    CAST(round(value*100) AS BIGINT) AS cents FROM events),
       |ws AS (SELECT ts_us, event_type, cents,
       |    (ts_us // 900000000) * 900000000 - k * 900000000 AS win_start
       |  FROM ev CROSS JOIN (SELECT unnest(range(4)) AS k)
       |  WHERE (ts_us // 900000000) * 900000000 - k * 900000000 + 3600000000 > ts_us)
       |SELECT strftime(make_timestamp(win_start), '%Y-%m-%d %H:%M:%S') AS window_start,
       |       event_type,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(SUM(cents) AS BIGINT) AS value_cents
       |FROM ws GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Session gap: 6 hours in micros — sized to the events table's time
    * spread so users get multiple multi-event sessions at every SF.
    * `GapInterval` derives from it so the session_window query and the
    * end_us arithmetic cannot drift apart.
    */
  val GapUs: Long = 6L * 3600 * 1000000
  val GapInterval: String = s"$GapUs microseconds"

  /** Shared sessionization CTE chain (lag → gap flag → running-sum
    * numbering), terminating in `numbered(user_id, ts_us, session_seq)`
    * — one definition feeding both session oracles.
    */
  private[queries] val sessionNumberedCte: String =
    s"""ev AS (SELECT user_id, event_id, $OracleTsUs AS ts_us FROM events),
       |flagged AS (SELECT user_id, ts_us, event_id,
       |    CASE WHEN lag(ts_us) OVER w IS NULL
       |           OR ts_us - lag(ts_us) OVER w > $GapUs
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |numbered AS (SELECT user_id, ts_us,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flagged)""".stripMargin

  // W3 — gap sessionization (lag + running-sum session numbering +
  // per-session aggregate) — the batch twin of the
  // flatMapGroupsWithState streaming operator.
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Sessions.sessionizeBatch(
        t(s, dir, "events").withColumn("ts_us", tsUs), GapUs)
      .orderBy("user_id", "session_seq")

  val sessionizeSql: String =
    s"""WITH $sessionNumberedCte
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |       min(ts_us) AS start_us, max(ts_us) AS end_us,
       |       CAST(count(*) AS BIGINT) AS n_events
       |FROM numbered GROUP BY 1, 2
       |ORDER BY user_id, session_seq""".stripMargin

  // W4 — Spark's BUILT-IN session_window (SessionWindow exec), checked
  // against the first-principles lag+running-sum definition: both must
  // produce identical (user, start, end, count) sessions. window.end is
  // last-event + gap by definition, so end_us subtracts the gap back.
  // Boundary note: session_window opens a new session at ts − last == gap
  // (exclusive end) while the lag definition uses strictly >; the two
  // differ only for events EXACTLY gap-separated to the microsecond,
  // which the events table cannot produce (sub-second jitter).
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_ts", timestamp_micros(tsUs))
      .groupBy(session_window(col("ts_ts"), GapInterval).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        (unix_micros(col("w.end")) - lit(GapUs)).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  val sessionWindowSql: String =
    s"""WITH $sessionNumberedCte
       |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
       |       CAST(count(*) AS BIGINT) AS n_events
       |FROM numbered GROUP BY user_id, session_seq
       |ORDER BY user_id, start_us""".stripMargin

  /** Purchase events (left/probe side of the temporal joins). */
  private def purchases(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts_us", tsUs)
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts_us")

  /** View events, columns renamed so a self-temporal-join is ambiguity-free. */
  private def views(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts_us", tsUs)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"),
        col("event_id").as("view_event_id"))

  private val purchasesCte =
    s"""p AS (SELECT user_id, event_id, $OracleTsUs AS ts_us
       |       FROM events WHERE event_type = 'purchase'),
       |v0 AS (SELECT user_id, $OracleTsUs AS view_ts_us,
       |         event_id AS view_event_id
       |       FROM events WHERE event_type = 'view')""".stripMargin

  // T5 — backward as-of join (kdb aj / merge_asof analog): each purchase
  // picks the user's LATEST view at or before it. Spark side is the
  // single-shuffle union + carry-forward merge-scan (AsOf.joinAsOf),
  // ties resolved by max event_id inside the window sort; DuckDB's
  // native ASOF LEFT JOIN is the oracle, with an explicit
  // (user, ts) → max(event_id) pre-reduction making its tie choice the
  // same total order.
  def asofJoin(s: SparkSession, dir: String): DataFrame =
    AsOf.joinAsOf(
        purchases(s, dir), views(s, dir), Seq("user_id"),
        leftTs = "ts_us", rightTs = "view_ts_us",
        payload = Seq("view_event_id", "view_ts_us"),
        tiebreak = col("view_event_id"))
      .withColumn("gap_us", col("ts_us") - col("view_ts_us"))
      .orderBy("event_id")

  val asofJoinSql: String =
    s"""WITH $purchasesCte,
       |v AS (SELECT user_id, view_ts_us, max(view_event_id) AS view_event_id
       |      FROM v0 GROUP BY 1, 2)
       |SELECT p.user_id, p.event_id, p.ts_us,
       |       v.view_event_id, v.view_ts_us,
       |       p.ts_us - v.view_ts_us AS gap_us
       |FROM p ASOF LEFT JOIN v
       |  ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
       |ORDER BY p.event_id""".stripMargin

  // T7 — FORWARD as-of join: the user's EARLIEST view at or after each
  // purchase (post-purchase behavior lookup). Same merge-scan over a
  // descending time sort; DuckDB's `<=` ASOF form is the oracle, its
  // tie choice pinned to the same total order by pre-reducing equal
  // (user, ts) view rows to max event_id.
  def asofForward(s: SparkSession, dir: String): DataFrame =
    AsOf.joinAsOf(
        purchases(s, dir), views(s, dir), Seq("user_id"),
        leftTs = "ts_us", rightTs = "view_ts_us",
        payload = Seq("view_event_id", "view_ts_us"),
        tiebreak = col("view_event_id"), direction = "forward")
      .withColumn("gap_us", col("view_ts_us") - col("ts_us"))
      .orderBy("event_id")

  val asofForwardSql: String =
    s"""WITH $purchasesCte,
       |v AS (SELECT user_id, view_ts_us, max(view_event_id) AS view_event_id
       |      FROM v0 GROUP BY 1, 2)
       |SELECT p.user_id, p.event_id, p.ts_us,
       |       v.view_event_id, v.view_ts_us,
       |       v.view_ts_us - p.ts_us AS gap_us
       |FROM p ASOF LEFT JOIN v
       |  ON p.user_id = v.user_id AND p.ts_us <= v.view_ts_us
       |ORDER BY p.event_id""".stripMargin

  /** Range-join lookback window: 24 h in micros. */
  val LookbackUs: Long = 24L * 3600 * 1000000

  // T6 — interval range join, bucketized to an equi-join (RangeJoin):
  // views of the same user in the 24 h BEFORE each purchase, then a
  // per-purchase rollup kept left-outer so zero-view purchases survive
  // with n_views = 0. The oracle runs the naive inequality join the
  // bucketing is provably equivalent to.
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val p = purchases(s, dir)
    val joined = RangeJoin.joinRange(
      p, views(s, dir), Seq("user_id"),
      leftTs = "ts_us", rightTs = "view_ts_us",
      lo = -LookbackUs, hi = 0L,
      payload = Seq("view_ts_us"))
    val rolled = joined.groupBy("user_id", "event_id", "ts_us")
      .agg(count(lit(1)).as("n_views"), max("view_ts_us").as("last_view_us"))
    p.join(rolled, Seq("user_id", "event_id", "ts_us"), "left")
      .withColumn("n_views", coalesce(col("n_views"), lit(0L)))
      .orderBy("event_id")
  }

  val rangeJoinSql: String =
    s"""WITH $purchasesCte,
       |j AS (SELECT p.user_id, p.event_id, p.ts_us, v.view_ts_us
       |      FROM p JOIN v0 v ON p.user_id = v.user_id
       |        AND v.view_ts_us >= p.ts_us - $LookbackUs
       |        AND v.view_ts_us < p.ts_us),
       |a AS (SELECT user_id, event_id, ts_us,
       |        CAST(count(*) AS BIGINT) AS n_views,
       |        max(view_ts_us) AS last_view_us
       |      FROM j GROUP BY 1, 2, 3)
       |SELECT p.user_id, p.event_id, p.ts_us,
       |       coalesce(a.n_views, 0) AS n_views, a.last_view_us
       |FROM p LEFT JOIN a USING (user_id, event_id, ts_us)
       |ORDER BY p.event_id""".stripMargin

  // T8 — interval-OVERLAP join (RangeJoin.joinOverlap): pairs of the
  // same customer's orders whose 7-day fulfillment windows [d, d+6]
  // intersect, with the overlap length. The window length bounds
  // maxLen by construction; the oracle is the naive inequality
  // self-join the bucketization is provably equivalent to.
  def overlapJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_custkey").as("custkey"),
      col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
        .cast("long").as("d0"))
    val l = o.select(col("custkey"), col("o_orderkey").as("o1"),
      col("d0").as("ls"), (col("d0") + 6).as("le"))
    val r = o.select(col("custkey"), col("o_orderkey").as("o2"),
      col("d0").as("rs"), (col("d0") + 6).as("re"))
    graft.operators.RangeJoin.joinOverlap(
        l, r, Seq("custkey"), "ls", "le", "rs", "re",
        maxLen = 6L, payload = Seq("o2", "rs", "re"))
      .filter(col("o1") < col("o2"))
      .select(
        col("custkey"), col("o1"), col("o2"),
        (least(col("le"), col("re")) - greatest(col("ls"), col("rs")) + 1)
          .as("overlap_days"))
      .orderBy("custkey", "o1", "o2")
  }

  val overlapJoinSql: String =
    """WITH o AS (SELECT o_custkey AS k, o_orderkey AS id,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0
      |  FROM orders)
      |SELECT a.k AS custkey, a.id AS o1, b.id AS o2,
      |  CAST(least(a.d0 + 6, b.d0 + 6) - greatest(a.d0, b.d0) + 1 AS BIGINT)
      |    AS overlap_days
      |FROM o a JOIN o b ON a.k = b.k AND a.id < b.id
      |  AND a.d0 <= b.d0 + 6 AND b.d0 <= a.d0 + 6
      |ORDER BY custkey, o1, o2""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("w2_windowed_agg", windowedAgg, Some(windowedAggSql)),
    QueryDef("w3_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("w4_session_window", sessionWindow, Some(sessionWindowSql)),
    QueryDef("t5_asof_join", asofJoin, Some(asofJoinSql)),
    QueryDef("t6_range_join", rangeJoin, Some(rangeJoinSql)),
    QueryDef("t7_asof_forward", asofForward, Some(asofForwardSql)),
    QueryDef("t8_overlap_join", overlapJoin, Some(overlapJoinSql)),
    QueryDef("w6_sliding_window", slidingWindowAgg, Some(slidingWindowAggSql)))
}
