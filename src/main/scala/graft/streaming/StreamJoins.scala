package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins and streaming dedup — the
  * Structured Streaming twins of graft.operators.RangeJoin and
  * graft.ops.Dedup.
  *
  * A stream-stream join must buffer both sides in state; unbounded
  * state is the streaming scale killer, so every operator here couples
  * the join predicate to watermarks that let Spark evict: the interval
  * condition bounds how long a buffered row can still match, and the
  * watermark bounds admitted lateness. State per key is then
  * O(rows within interval + lateness), independent of stream length —
  * the invariant that keeps a 100-day topic and a 100-minute topic the
  * same query.
  */
object StreamJoins {

  /** Inner interval join: left row l matches right rows r with the same
    * `key` and `r.ts ∈ [l.ts + loSec, l.ts + hiSec]` (seconds, event
    * time). Both inputs must already carry watermarks; the two range
    * conjuncts are what lets Spark derive state-eviction bounds for
    * BOTH sides (a single-sided bound would leave one side's state
    * growing forever).
    *
    * Column names must be disjoint apart from `key` — rename upstream.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      loSec: Long, hiSec: Long): DataFrame = {
    require(loSec <= hiSec, s"empty interval: [$loSec, $hiSec]")
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") + expr(s"INTERVAL $loSec SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $hiSec SECONDS"))
      .drop(col(s"r.$key"))
  }

  /** Streaming dedup on `keys` that keeps state only within the
    * watermark: duplicates separated by more than the watermark delay
    * are treated as fresh rows, in exchange for state that stays
    * bounded by the delay window instead of growing with the key
    * cardinality of the whole stream — Spark's
    * `dropDuplicatesWithinWatermark`, which is the only honest contract
    * for an infinite stream (exact global dedup needs unbounded state).
    * `tsCol` must be the watermarked event-time column.
    */
  def dedupWithinWatermark(
      stream: DataFrame, keys: Seq[String], tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
