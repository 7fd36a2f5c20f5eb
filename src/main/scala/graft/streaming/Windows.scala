package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation shared by the batch query surface
  * (graft.queries.Temporal.windowedAgg) and Structured Streaming: the
  * same plan fragment runs incrementally when the input is a streaming
  * DataFrame — callers add `withWatermark(tsCol, ...)` first so Spark
  * can close windows and emit them in Append mode, keeping state
  * bounded to open windows.
  */
object Windows {

  /** Epoch-aligned 1-hour tumbling rollup per event_type: row count and
    * cent-exact value sum. `tsCol` must be a timestamp column.
    */
  def tumblingTypeAgg(ev: DataFrame, tsCol: String): DataFrame =
    ev.groupBy(window(col(tsCol), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n"), col("value_cents"))
}
