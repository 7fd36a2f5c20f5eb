package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Sessions

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
  private val sessionNumberedCte: String =
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("w2_windowed_agg", windowedAgg, Some(windowedAggSql)),
    QueryDef("w3_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("w4_session_window", sessionWindow, Some(sessionWindowSql)))
}
