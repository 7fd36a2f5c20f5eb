package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Event-time sessionization — the canonical custom-state streaming
  * operator (no reference counterpart; the reference's only state lives
  * in Delta MERGE, SURVEY.md §2.9 — this extends the engine to genuine
  * stateful stream processing).
  *
  * A session is a maximal run of a user's events where consecutive
  * events are ≤ `gap` apart (event time). Two implementations with
  * identical results:
  *   - `sessionizeBatch`: lag + running-sum session numbering over a
  *     window — one shuffle on user_id, SQL-expressible, DuckDB-checked.
  *   - `sessionizeStream`: `flatMapGroupsWithState` keeping one open
  *     session per user; arrival of an event > gap after the last seen
  *     closes and EMITS the previous session. State is O(users), not
  *     O(events) — the 100 TB shape for streaming sessionization.
  */
object Sessions {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)

  /** Watermarked event: the timestamp column must flow INTO the
    * stateful operator for EventTimeTimeout (Spark's analyzer rejects a
    * plan whose watermark attribute was projected away).
    */
  final case class EvW(user_id: Long, ts_us: Long, event_id: Long, ts_ts: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Batch sessionization: W-function pipeline (lag → gap flag →
    * running sum → per-session aggregate). Total order inside a user is
    * (ts_us, event_id) so ties can't flip session numbering.
    */
  def sessionizeBatch(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select("user_id", "ts_us", "event_id")
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_us") - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming sessionization. Emits a session when a later event of
    * the same user closes it; the trailing open session per user stays
    * in state until either a successor arrives or — in
    * `sessionizeStreamWithTimeout` — the event-time watermark passes
    * `lastUs + gap` and the idle session is flushed.
    *
    * Assumes event time is non-decreasing ACROSS micro-batches per user
    * (in-batch disorder is fine — each batch is sorted before folding);
    * a watermark upstream is what bounds cross-batch lateness.
    */
  def sessionizeStream(ev: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionFold(gapUs, timeout = false))
  }

  /** Sessionization with watermark-driven idle flush: takes the raw
    * (user_id, ts_us, event_id) stream, stamps the event-time column,
    * applies the watermark, and runs the stateful fold under
    * EventTimeTimeout — a user whose open session has seen no event by
    * the time the watermark passes `lastUs + gap` gets that session
    * EMITTED and the state cleared, so sessions of departed users leave
    * state instead of parking there forever (the bounded-state
    * requirement at 100 TB).
    */
  def sessionizeStreamWithTimeout(
      ev: DataFrame,
      gapUs: Long,
      maxLateness: String = "0 seconds"): Dataset[Session] = {
    import ev.sparkSession.implicits._
    ev.select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts_ts", maxLateness)
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[EvW], state: GroupState[OpenSession]) =>
          sessionFold(gapUs, timeout = true)(
            user, batch.map(e => Ev(e.user_id, e.ts_us, e.event_id)), state)
      }
  }

  /** Batch item for the interval sweep below: a closed range of event
    * time carrying its member count (an event is a width-0 interval).
    */
  private final case class Span(start: Long, end: Long, n: Long)

  /** The per-group fold: merges the admitted batch AND the open session
    * as one sorted interval sweep, so every disorder pattern a
    * `maxLateness > 0` watermark admits folds exactly like the batch
    * twin's min/max-over-members — including a late event that precedes
    * the open session by MORE than the gap, which forms its own earlier
    * session (the pre-sweep fold silently absorbed it into the open
    * session). Reconciliation is necessarily bounded by what is still
    * in state: an event so late it predates an already-EMITTED session
    * starts a fresh session rather than reopening the emitted one —
    * append-mode output cannot be retracted; size the watermark so
    * admitted lateness stays within the open session's horizon.
    */
  private def sessionFold(gapUs: Long, timeout: Boolean)(
      user: Long, batch: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] =
    if (timeout && state.hasTimedOut) {
      // watermark passed lastUs + gap with no new events: flush
      val s = state.get
      state.remove()
      Iterator.single(Session(user, s.startUs, s.lastUs, s.n))
    } else {
      val evs = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
        .map(e => Span(e.ts_us, e.ts_us, 1L))
      val items = state.getOption match {
        case Some(s) =>
          // insert the open interval at its sorted-by-start position
          val (before, after) = evs.partition(_.start < s.startUs)
          (before :+ Span(s.startUs, s.lastUs, s.n)) ++ after
        case None => evs
      }
      val closed = Seq.newBuilder[Session]
      var cur = items.head // non-empty: invoked with events or a timeout
      items.tail.foreach { i =>
        if (i.start - cur.end > gapUs) {
          closed += Session(user, cur.start, cur.end, cur.n)
          cur = i
        } else {
          cur = Span(cur.start, math.max(cur.end, i.end), cur.n + i.n)
        }
      }
      state.update(OpenSession(cur.start, cur.end, cur.n))
      if (timeout) state.setTimeoutTimestamp((cur.end + gapUs) / 1000 + 1)
      closed.result().iterator
    }

  /** The open (unclosed) sessions currently in `sessionizeBatch` terms:
    * the last session of each user — what `sessionizeStream` still holds
    * in state. Used by specs to reconcile the two implementations.
    */
  def lastSessionPerUser(batchSessions: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("session_seq").desc)
    batchSessions.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
