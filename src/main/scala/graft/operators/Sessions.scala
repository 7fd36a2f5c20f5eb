package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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
    * in state (a production deployment adds an event-time timeout via
    * watermark to flush idle sessions — the spec exercises the
    * close-by-successor path, which is the stateful core).
    *
    * Assumes event time is non-decreasing ACROSS micro-batches per user
    * (in-batch disorder is fine — each batch is sorted before folding);
    * a watermark upstream is what bounds cross-batch lateness.
    */
  def sessionizeStream(ev: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_us - s.lastUs > gapUs =>
                closed += Session(user, s.startUs, s.lastUs, s.n)
                open = Some(OpenSession(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                open = Some(OpenSession(s.startUs, math.max(s.lastUs, e.ts_us), s.n + 1))
              case None =>
                open = Some(OpenSession(e.ts_us, e.ts_us, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
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
