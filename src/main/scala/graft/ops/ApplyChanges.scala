package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.Upsert.{scol, tcol, MergeClause}
import graft.table.Versioned

/** `APPLY CHANGES INTO` — the Delta Live Tables CDC-apply analog
  * (Databricks' `dlt.apply_changes`): materialize a change feed
  * (row-level inserts/updates/deletes with an ordering column) into a
  * versioned table as either the LATEST STATE per key (SCD type 1) or
  * the FULL HISTORY with validity intervals (SCD type 2).
  *
  * Shared contract:
  *  - `sequenceBy` totally orders changes per key (a commit version, an
  *    ingestion timestamp). Ties break on row content — deterministic
  *    but meaningless; give unique sequences.
  *  - `deleteWhen` marks source rows as deletions (DLT's
  *    `apply_as_deletes`); the predicate's columns may be feed-only
  *    metadata — they never land in the table (merge
  *    `conditionColumns`).
  *  - Out-of-order and REPLAYED rows at-or-before the state already
  *    applied are ignored, so re-applying a batch is a no-op — apply is
  *    monotone in the sequence, which is what makes it safe under
  *    foreachBatch retries (pair with [[applyChangesIdempotent]] for
  *    the transactional watermark on top).
  *  - Cost has the MERGE shape: one touched-file discovery scan + a
  *    copy-on-write rewrite of files holding affected keys. Nothing is
  *    driver-materialized; the per-key window runs as one shuffle of
  *    the (log-sized) change batch, not the table.
  */
object ApplyChanges {

  private def prep(
      source: DataFrame, keys: Seq[String], sequenceBy: String,
      deleteWhen: Option[Column], except: Seq[String]): DataFrame = {
    require(!except.contains(sequenceBy),
      s"exceptColumns must not drop the sequence column $sequenceBy")
    source
      .withColumn("__ac_del",
        coalesce(deleteWhen.getOrElse(lit(false)), lit(false)))
      .drop(except: _*)
  }

  /** Total per-key order: the sequence, then every other column — a
    * deterministic tiebreak so duplicate sequences cannot make two runs
    * disagree.
    */
  private def keyOrder(df: DataFrame, keys: Seq[String], sequenceBy: String) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col(sequenceBy).asc +:
        df.columns.toSeq.filterNot(c => keys.contains(c) || c == sequenceBy)
          .sorted.map(col(_).asc): _*)

  /** SCD TYPE 1: the table holds each key's newest surviving row; a
    * delete whose sequence is newest removes the key. The table's
    * schema is the feed's data schema INCLUDING `sequenceBy` — the
    * stored sequence is the replay guard (`s.seq > t.seq`), exactly
    * DLT's stored-sequencing contract. One MERGE commit.
    */
  def scd1(
      spark: SparkSession, dir: String, source: DataFrame, keys: Seq[String],
      sequenceBy: String, deleteWhen: Option[Column] = None,
      exceptColumns: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Option[Long] = {
    val s0 = prep(source, keys, sequenceBy, deleteWhen, exceptColumns)
    // newest change per key wins outright (intermediate intra-batch
    // versions never touch the table — DLT's semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(sequenceBy).desc +:
        s0.columns.toSeq.filterNot(c => keys.contains(c) || c == sequenceBy)
          .sorted.map(col(_).desc): _*)
    val latest = s0.withColumn("__ac_rn", row_number().over(w))
      .filter(col("__ac_rn") === 1).drop("__ac_rn")
    if (Versioned.currentVersion(spark, dir).isEmpty) {
      // first apply CREATES the table (DLT's shape): the newest
      // surviving row per key is the initial state
      val init = latest.filter(!col("__ac_del")).drop("__ac_del")
      return txn match {
        case Some((appId, b)) =>
          Versioned.overwriteIdempotent(init, dir, appId, b)
        case None => Some(Versioned.overwrite(init, dir))
      }
    }
    val newer = scol(sequenceBy) > tcol(sequenceBy)
    // deletes apply AT-OR-AFTER the stored sequence: a CDC tool that
    // stamps deletion time sends a newer sequence, but a change-feed-
    // derived delete carries the deleted row's OWN sequence — it
    // tombstones the exact version the table holds. Updates stay
    // strictly newer (the replay guard).
    val deletable = scol(sequenceBy) >= tcol(sequenceBy)
    Versioned.mergeFullTxn(
      spark, dir, latest, keys,
      matched = Seq(
        MergeClause.Delete(cond = Some(scol("__ac_del") && deletable)),
        MergeClause.Update(cond = Some(newer))),
      notMatched = Seq(MergeClause.Insert(cond = Some(!scol("__ac_del")))),
      txn = txn, conditionColumns = Seq("__ac_del"))
  }

  /** SCD TYPE 2: the table holds each key's full history as validity
    * intervals — data columns plus `__START_AT`/`__END_AT` typed like
    * `sequenceBy`, the open (current) row carrying a NULL `__END_AT`
    * (DLT's generated columns of the same names). Within one batch a
    * key may carry several versions: each non-delete change opens a
    * segment `[seq, next_seq)` bounded by the NEXT change's sequence
    * (deletes bound their predecessor and insert nothing). Rows
    * at-or-before the key's open `__START_AT` are stale — replays and
    * out-of-order stragglers — and are ignored. One MERGE commit on
    * `(keys, __START_AT)`: close-instructions update the open row's
    * `__END_AT`; fresh segments insert; replayed segments match
    * existing history rows and carry unchanged.
    */
  def scd2(
      spark: SparkSession, dir: String, source: DataFrame, keys: Seq[String],
      sequenceBy: String, deleteWhen: Option[Column] = None,
      exceptColumns: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Option[Long] = {
    val s0 = prep(source, keys, sequenceBy, deleteWhen, exceptColumns)
    val dataCols = s0.columns.toSeq.filterNot(_ == "__ac_del")
    val exists = Versioned.currentVersion(spark, dir).isDefined

    // stale-row fence: per key, the open row's __START_AT (none for
    // brand-new keys / a brand-new table)
    val fenced =
      if (!exists) s0
      else {
        val open = Versioned.read(spark, dir)
          .filter(col("__END_AT").isNull)
          .select(keys.map(col) :+ col("__START_AT").as("__ac_fence"): _*)
        // deletes pass the fence at EQUALITY too (the change-feed
        // delete carries the tombstoned version's own sequence); the
        // open interval then closes as [s, s) — collapsed, the best
        // available representation when the feed stamps no deletion
        // time. CDC feeds with real deletion stamps keep full history.
        s0.join(open, keys, "left")
          .filter(col("__ac_fence").isNull ||
            col(sequenceBy) > col("__ac_fence") ||
            (col("__ac_del") && col(sequenceBy) === col("__ac_fence")))
          .drop("__ac_fence")
      }

    // segments: every change bounds its predecessor via lead(); deletes
    // bound but never open
    val w = keyOrder(fenced, keys, sequenceBy)
    val seg = fenced
      .withColumn("__END_AT", lead(col(sequenceBy), 1).over(w))
      .withColumn("__START_AT", col(sequenceBy))
    val fresh = seg.filter(!col("__ac_del"))
      .withColumn("__ac_close", lit(false))
    val outCols = dataCols.filterNot(_ == sequenceBy)

    if (!exists) {
      // first apply creates the table: the surviving segments ARE the
      // initial history
      val init = fresh.select(
        (outCols.map(col) ++ Seq(col("__START_AT"), col("__END_AT"))): _*)
      return txn match {
        case Some((appId, b)) =>
          Versioned.overwriteIdempotent(init, dir, appId, b)
        case None => Some(Versioned.overwrite(init, dir))
      }
    }

    // close-instructions: the open row ends at its key's FIRST retained
    // change (data columns ride along from the open row — the matched
    // clause only sets __END_AT, so they are never consulted)
    val firstSeq = fenced.groupBy(keys.map(col): _*)
      .agg(min(col(sequenceBy)).as("__ac_first"))
    val openRows = Versioned.read(spark, dir).filter(col("__END_AT").isNull)
    val closes = openRows.join(firstSeq, keys)
      .withColumn("__END_AT", col("__ac_first"))
      .withColumn("__ac_close", lit(true))
      .drop("__ac_first")

    val src = fresh
      .select((outCols.map(col) ++
        Seq(col("__START_AT"), col("__END_AT"), col("__ac_close"))): _*)
      .unionByName(closes.select((outCols.map(col) ++
        Seq(col("__START_AT"), col("__END_AT"), col("__ac_close"))): _*))

    Versioned.mergeFullTxn(
      spark, dir, src, keys :+ "__START_AT",
      matched = Seq(MergeClause.Update(
        cond = Some(scol("__ac_close")),
        set = Map("__END_AT" -> scol("__END_AT")))),
      notMatched = Seq(MergeClause.Insert(cond = Some(!scol("__ac_close")))),
      txn = txn, conditionColumns = Seq("__ac_close"))
  }

  /** [[scd1]]/[[scd2]] under the writer-transaction watermark, landing
    * the watermark IN the apply commit (the
    * [[Versioned.mergeIdempotent]] contract): an already-applied
    * `(appId, batchId)` is a full no-op and a crash between commit and
    * checkpoint replays safely — the foreachBatch shape for streaming
    * CDC apply.
    */
  def idempotent(
      spark: SparkSession, dir: String, source: DataFrame, keys: Seq[String],
      sequenceBy: String, appId: String, batchId: Long,
      deleteWhen: Option[Column] = None, exceptColumns: Seq[String] = Nil,
      scdType: Int = 1): Option[Long] = {
    require(scdType == 1 || scdType == 2, s"scdType must be 1 or 2: $scdType")
    if (Versioned.lastTxnVersion(spark, dir, appId).exists(_ >= batchId)) None
    else if (scdType == 1)
      scd1(spark, dir, source, keys, sequenceBy, deleteWhen, exceptColumns,
        txn = Some(appId -> batchId))
    else
      scd2(spark, dir, source, keys, sequenceBy, deleteWhen, exceptColumns,
        txn = Some(appId -> batchId))
  }
}
