package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.Versioned

/** Incrementally-maintained aggregate gold table over a versioned
  * silver table's change feed — the materialized-view-maintenance half
  * of the medallion story (the reference recomputes its gold metrics
  * from full silver scans every run, `07_gold_metrics_revenue.py`; at
  * 100 TB that full fact-table re-aggregation is the nightly-job
  * bottleneck this operator removes).
  *
  * Maintains `gold = silver.groupBy(keys).agg(count(*) as n,
  * sum(c) as sum_c ...)` from `Versioned.changes(lastApplied, current)`:
  * inserts contribute +1/+value, deletes −1/−value (an upsert is the
  * pair), so the refresh aggregates O(changes) silver rows instead of
  * re-scanning the whole fact table; the only O(gold) work left is the
  * final merge of per-key deltas into the (much smaller) aggregate
  * table. Keys whose row count reaches zero vanish, exactly as a full
  * recompute would drop them.
  *
  * Aggregate classes by maintainability:
  *
  *  - count/sum (and avg as sum/n) are SELF-INVERTING — maintainable
  *    under any change window via signed deltas.
  *  - min/max are insert-monotone but not invertible: an APPEND-ONLY
  *    window maintains them as `min(old, window-min)` over only the
  *    added files, but a window containing deletes/updates forces one
  *    full recompute (knowing whether the departed row WAS the min
  *    requires the per-key row set). The fallback is loud in cost,
  *    never wrong in content — and fact tables' windows are
  *    append-only in the common case.
  *
  * Sums over integral columns are bit-exact against recompute; float
  * sums accumulate reordering ulps like any streaming aggregation —
  * use the cents-long pattern for money.
  *
  * Progress is tracked in the GOLD table's own commit log as a writer
  * transaction (appId [[App]], txnVersion = the silver version the
  * snapshot reflects), so refresh is idempotent and crash-safe: a
  * refresh that dies before its commit leaves the watermark untouched
  * and the next run replays the same change window. If the silver
  * table was vacuumed past the watermark, the change window is gone
  * and refresh falls back to one full recompute — loudly impossible to
  * get wrong, never silently incomplete.
  */
object IncrementalAgg {

  /** Writer-transaction id under which refresh watermarks are logged. */
  val App = "graft-cdf-agg"

  private def grouped(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** The per-key aggregate row computed FROM SILVER ROWS (bootstrap,
    * recompute, and the append-only delta all share it).
    */
  private def rowAggs(sumCols: Seq[String], minMaxCols: Seq[String]): Seq[Column] =
    (count(lit(1)).as("n") +: sumCols.map(c => sum(col(c)).as(s"sum_$c"))) ++
      minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))

  /** The merge of gold rows with per-key delta rows (same columns). */
  private def mergeAggs(sumCols: Seq[String], minMaxCols: Seq[String]): Seq[Column] =
    (sum(col("n")).as("n") +: sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))) ++
      minMaxCols.flatMap(c =>
        Seq(min(col(s"min_$c")).as(s"min_$c"), max(col(s"max_$c")).as(s"max_$c")))

  /** Brings `goldDir` up to silver's current version. Returns the new
    * gold version, or None when gold is already current (a no-op costs
    * two log reads, no data I/O).
    */
  def refresh(
      spark: SparkSession,
      silverDir: String,
      goldDir: String,
      keys: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): Option[Long] = {
    val silverV = Versioned.currentVersion(spark, silverDir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $silverDir"))
    val applied = Versioned.lastTxnVersion(spark, goldDir, App)
    if (applied.exists(_ >= silverV)) return None

    def full: DataFrame = grouped(
      Versioned.readAt(spark, silverDir, silverV),
      keys, rowAggs(sumCols, minMaxCols))

    val next = applied match {
      // incremental path: the applied version must still be readable
      // (not vacuumed away) to diff against
      case Some(a) if Versioned.versions(spark, silverDir).contains(a) =>
        if (Versioned.isAppendOnlyWindow(spark, silverDir, a, silverV)) {
          // append-only window (the common case for fact tables): the
          // log's add-actions ARE the inserts — no snapshot diff at
          // all, the refresh opens only the files the window added
          // (the probe above already validated the window — the
          // validated twin skips the second op scan). min/max merge
          // monotonically under pure inserts.
          val deltaAgg = grouped(
            Versioned.addedSinceValidated(spark, silverDir, a, silverV),
            keys, rowAggs(sumCols, minMaxCols))
          grouped(
            Versioned.read(spark, goldDir).unionByName(deltaAgg),
            keys, mergeAggs(sumCols, minMaxCols))
            .filter(col("n") > 0)
        } else if (minMaxCols.nonEmpty)
          // a delete/update window invalidates maintained min/max (the
          // departed row may have BEEN the extreme) — one full
          // recompute, correct by construction
          full
        else {
          val sign =
            when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
          val deltaAgg = grouped(
            Versioned.changes(spark, silverDir, a, silverV),
            keys,
            sum(sign).as("n") +: sumCols.map(c => sum(sign * col(c)).as(s"sum_$c")))
          grouped(
            Versioned.read(spark, goldDir).unionByName(deltaAgg),
            keys, mergeAggs(sumCols, Nil))
            .filter(col("n") > 0)
        }
      case _ => full
    }
    Versioned.overwriteIdempotent(next, goldDir, App, silverV)
  }

  /** The full-recompute twin of the maintained table — what `refresh`
    * must always equal. Specs diff the two after every commit.
    */
  def recompute(
      spark: SparkSession, silverDir: String,
      keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): DataFrame =
    grouped(
      Versioned.read(spark, silverDir),
      keys, rowAggs(sumCols, minMaxCols))
}
