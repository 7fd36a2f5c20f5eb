package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** MERGE/upsert re-implemented without Delta Lake (SURVEY.md §2.2, §7.3).
  *
  * The reference's four merge variants, all built on
  * `DeltaTable.merge(...)`:
  *   - M1 insert-only (`01_bronze_csv_to_delta.py:58-68`)
  *   - M2 conditional-update / last-writer-wins
  *     (`02_bronze_to_silver.py:67-87` and six more entities)
  *   - M3 unconditional-update (`03_gold_dimensions.py:64-81`, `05:65-85`)
  *   - M4 update-all (`02:463-475`)
  *
  * Design: MERGE == a full-outer equi-join of target and source on the key
  * columns, with per-column conditional selection. Spark executes it as a
  * single shuffle on the keys (or a broadcast join when one side is small);
  * no driver-side iteration. Like Delta, the source must be key-unique —
  * the reference guarantees this by running W1 dedup before every merge.
  *
  * Scale: Delta prunes untouched *files*; this rewrite reprocesses the
  * whole target. That is the documented trade-off (§4) — at 100 TB one
  * would partition the target by a key prefix and rewrite only partitions
  * containing source keys (see `partitionedMergePlan` note below).
  */
object Upsert {

  private val T = "__t__"
  private val S = "__s__"

  /** M1 — insert-only merge: rows of `source` whose key is absent from
    * `target`, appended. Re-running with the same source never duplicates
    * (file-level idempotence when keyed on `source_file`, `01:64-67`).
    * Physical plan: left-anti join, broadcastable when the distinct key
    * set of the target is small.
    */
  def insertOnly(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(newRows(target, source, keys))

  /** Just the to-insert slice of M1 (what an incremental writer appends). */
  def newRows(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    source.join(target.select(keys.map(col): _*), keys, "left_anti")

  /** M2/M3/M4 — matched-update + not-matched-insert merge.
    *
    * @param updateWhen matched rows take the source version only when this
    *                   predicate (over prefixed column refs, see `tcol`/
    *                   `scol`) holds; `lit(true)` gives M3/M4 semantics.
    *                   The reference's LWW condition is
    *                   `scol("ingestion_ts") > tcol("ingestion_ts")`.
    * @param setCols    columns the matched-update writes; others keep the
    *                   target value (M2's explicit set-lists). Default =
    *                   all non-key columns (M4 `whenMatchedUpdateAll`).
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateWhen: Column = lit(true),
      setCols: Seq[String] = Nil): DataFrame = {
    require(target.columns.sameElements(source.columns) ||
      target.columns.toSet == source.columns.toSet,
      s"merge requires same columns; got ${target.columns.toSeq} vs ${source.columns.toSeq}")
    val cols = target.columns.toSeq
    val sets = if (setCols.isEmpty) cols.filterNot(keys.contains) else setCols

    val t = cols.foldLeft(target)((d, c) => d.withColumnRenamed(c, T + c))
      .withColumn(T + "present", lit(true))
    val s = cols.foldLeft(source)((d, c) => d.withColumnRenamed(c, S + c))
      .withColumn(S + "present", lit(true))

    val on = keys.map(k => t.col(T + k) === s.col(S + k)).reduce(_ && _)
    val j = t.join(s, on, "full_outer")

    val tPresent = col(T + "present").isNotNull
    val sPresent = col(S + "present").isNotNull
    val matched = tPresent && sPresent
    val takeSource = (matched && updateWhen) || (!tPresent && sPresent)

    val out = cols.map { c =>
      if (keys.contains(c)) coalesce(col(S + c), col(T + c)).as(c)
      else if (sets.contains(c)) when(takeSource, col(S + c)).otherwise(col(T + c)).as(c)
      else when(tPresent, col(T + c)).otherwise(col(S + c)).as(c)
    }
    j.select(out: _*)
  }

  /** Column ref helpers for `updateWhen` predicates. */
  def tcol(name: String): Column = col(T + name)
  def scol(name: String): Column = col(S + name)

  /** Last-writer-wins merge (the reference's M2 shape): matched rows are
    * replaced only when the source's `versionCol` is strictly newer
    * (`02:74`, `02:208`, `02:345`, `02:656`, `02:749`, `02:844`, `04:117`).
    */
  def lastWriterWins(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      versionCol: String): DataFrame =
    merge(target, source, keys, updateWhen = scol(versionCol) > tcol(versionCol))
}
