package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{Entities, LakeRoots, Silver}
import graft.table.{Table, TableRef}

/** Streaming ingestion — the reference's EP1 entry shape
  * (`01_bronze_csv_to_delta.py`) on OSS Structured Streaming:
  * file-source CSV scan (S1) with pinned schema, dynamic table discovery
  * (S2, `01:16-31`), ingestion metadata stamping (S3), `foreachBatch`
  * sink (S9) running an idempotent insert-only merge (M1) into the
  * bronze table, per-stream checkpoint (S10), `Trigger.AvailableNow`
  * drain-and-stop (S11/S12).
  *
  * Exactly-once story, same as the reference: the checkpoint makes each
  * *file* enter at most one batch across restarts, and the M1 merge on
  * `source_file` makes re-delivered files no-ops — so replays after a
  * checkpoint wipe are still safe.
  *
  * M1 at scale: Delta resolved "have I seen this file?" against log
  * metadata; a naive parquet port re-scans the whole bronze table per
  * micro-batch. Instead each bronze table keeps a tiny *seen-files
  * manifest* sidecar (one row per ingested file) and the anti-join runs
  * against that — per-batch cost follows the file count, not the row
  * count. The bronze append and the manifest append are two writes, not
  * one transaction (that one-commit coupling is exactly what Delta's log
  * provided): bronze is written first, so a crash between the two writes
  * can never LOSE data, but it leaves the manifest missing a file that
  * bronze already holds — and a subsequent *checkpoint-wiped* replay
  * would then re-append that file (duplicates). That failure needs both
  * the crash landing in the two-write window AND the checkpoint being
  * lost; when it happens, `reconcileManifest` restores exact-once with
  * one bronze scan. With the checkpoint intact the file never re-enters
  * a batch at all, regardless of crashes.
  */
object Ingest {

  /** Streaming CSV source with ingestion metadata (01:33-44). The
    * reference infers schemas via Auto Loader; we pin them — inference
    * is nondeterministic across runs (SURVEY.md §1.3).
    */
  def csvStream(spark: SparkSession, srcDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .withColumn("ingestion_ts", current_timestamp())
      .withColumn("source_file", col("_metadata.file_path"))

  /** Runs any micro-batch function under availableNow + checkpoint
    * (S9-S12) and blocks until the drain completes.
    */
  def runAvailableNow(stream: DataFrame, checkpoint: String)(
      fn: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Exactly-once stream → versioned table: each micro-batch commits
    * through `Versioned.appendIdempotent` keyed by (`appId`, batchId).
    * The table's own log carries the high-water batchId per writer, so
    * a replayed micro-batch — retried epoch, or a full re-run after the
    * CHECKPOINT is wiped (batchIds restart at 0, all at-or-below the
    * watermark) — is refused at the log and never duplicates rows.
    * This is the second half of the exactly-once contract the
    * checkpoint alone can't give (the Delta `txnAppId`/`txnVersion`
    * sink option; reference site `01_bronze_csv_to_delta.py:49-56`
    * leans on Delta for this implicitly).
    *
    * Checkpoint-wipe caveat (Delta documents the same hazard for
    * txnAppId/txnVersion sinks): the wiped-replay guarantee holds only
    * while the source input is UNCHANGED since the wipe. If new files
    * arrive before the re-run, the restarted stream renumbers batches
    * from 0 and may bundle old and NEW files into one low-numbered
    * batch — the txn watermark refuses the whole batch while the fresh
    * checkpoint marks its files processed, silently dropping the new
    * rows. After losing a checkpoint, drain the re-run to the wipe
    * point BEFORE admitting new input (or use a fresh appId and dedup
    * downstream).
    */
  def sinkVersionedExactlyOnce(
      stream: DataFrame, dir: String, appId: String, checkpoint: String): Unit =
    runAvailableNow(stream, checkpoint) { (batch, batchId) =>
      graft.table.Versioned.appendIdempotent(batch, dir, appId, batchId)
    }

  /** Structured Streaming source over a VERSIONED table — tails the
    * table's own transaction log, one micro-batch per commit range
    * (`spark.readStream.format("graft-versioned")`), the reference's
    * `readStream.format("delta")` shape at its three silver ingest
    * sites (`02_bronze_to_silver.py:20-24,122-126,253-257`). Offsets
    * are log versions checkpointed by the engine; append commits emit
    * their add-action rows, optimize/compact commits emit nothing, and
    * row-mutating commits stop the stream loudly
    * (graft.table.Versioned.streamBatch has the full contract).
    */
  def versionedStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("graft-versioned").option("path", dir).load()

  /** Streaming CHANGE FEED of a versioned table (Delta's
    * `option("readChangeFeed", "true")` analog): rows plus
    * `_change_type` (insert/delete; an update = delete+insert pair),
    * row-mutating commits streamed instead of stopping the stream —
    * the modern form of the reference's silver→gold propagation
    * (`02_bronze_to_silver.py:20-24`).
    */
  def versionedChangeFeed(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("graft-versioned")
      .option("path", dir).option("readChangeFeed", "true").load()

  /** STREAMING CDC APPLY — the end-to-end DLT `apply_changes` pipeline
    * shape: tail `srcDir`'s change feed and materialize it into
    * `targetDir` as SCD type 1 or 2 ([[graft.ops.ApplyChanges]]), one
    * idempotent apply commit per micro-batch (the watermark lands IN
    * the commit, so retried epochs and checkpoint-wiped replays are
    * no-ops). Feed plumbing is derived from `_change_type`: `delete`
    * rows mark removals, `update_preimage` rows (the OLD image of an
    * update — not a change) are excluded, and the column itself never
    * reaches the target. `sequenceBy` must be a DATA column the
    * upstream writers keep monotone per key (an ingestion timestamp /
    * source commit version — DLT's own contract): an upstream update
    * that does not advance it is, by the apply's replay rule,
    * indistinguishable from a stale replay and ignored.
    */
  def applyChangesStream(
      spark: SparkSession, srcDir: String, targetDir: String,
      keys: Seq[String], sequenceBy: String, checkpoint: String,
      scdType: Int = 1, appId: String = "graft-apply-changes"): Unit = {
    import org.apache.spark.sql.functions.col
    runAvailableNow(versionedChangeFeed(spark, srcDir), checkpoint) {
      (batch, batchId) =>
        graft.ops.ApplyChanges.idempotent(
          spark, targetDir,
          batch.filter(col("_change_type") =!= "update_preimage"),
          keys, sequenceBy, appId, batchId,
          deleteWhen = Some(col("_change_type") === "delete"),
          exceptColumns = Seq("_change_type"), scdType = scdType)
        ()
    }
  }

  /** Seen-files manifest sidecar of a bronze table. */
  def manifestRef(bronze: TableRef): TableRef = TableRef(bronze.dir + "._manifest")

  /** Rebuilds the manifest from the bronze table itself (one full scan).
    * Use to migrate a manifest-less table, or to repair after the
    * documented crash window (bronze append committed, manifest append
    * lost) before a checkpoint-wiped replay — restores exact-once.
    */
  def reconcileManifest(spark: SparkSession, bronze: TableRef): Unit =
    Table.overwriteAtomic(
      Table.read(spark, bronze).select("source_file").distinct(), manifestRef(bronze))

  /** EP1 end-to-end: CSV dir → bronze table, file-level idempotent
    * (01:46-77). Returns after the available input is drained.
    */
  def csvToBronze(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      bronze: TableRef,
      checkpoint: String): Unit =
    runAvailableNow(csvStream(spark, srcDir, schema), checkpoint) { (batch, _) =>
      if (!batch.isEmpty) { // P11 batch guard (02:30-31)
        val manifest = manifestRef(bronze)
        if (!Table.exists(spark, bronze)) {
          Table.overwriteAtomic(batch, bronze)
          Table.overwriteAtomic(batch.select("source_file").distinct(), manifest)
        } else {
          // migration for manifest-less tables: materialize once from
          // bronze UNCONDITIONALLY (doing it only when fresh rows exist
          // would leave all-seen batches full-scanning bronze forever)
          if (!Table.exists(spark, manifest)) reconcileManifest(spark, bronze)
          // M1: append only rows from files the manifest has not seen.
          val seen = Table.read(spark, manifest)
          val fresh = batch.join(seen, Seq("source_file"), "left_anti")
          if (!fresh.isEmpty) {
            Table.append(fresh, bronze)
            Table.append(fresh.select("source_file").distinct(), manifest)
          }
        }
      }
    }

  /** Schema evolution (`01:40` `cloudFiles.schemaEvolutionMode =
    * addNewColumns` analog): union the pinned schema with any new
    * header columns found in the source directory's CSVs, appended as
    * nullable strings (raw CSV columns are all-string by contract,
    * SURVEY.md §1.3). The evolved schema persists at `schemaLocation`
    * (Auto Loader's schema-tracking analog, `01:37`) so columns
    * discovered from files that later expire are never forgotten.
    *
    * Cost model: one driver-side header line per source file — the same
    * file-count-scale metadata I/O as the stream's own directory
    * listing, never a data scan. Assumes evolution appends columns
    * (CSV parsing under a pinned schema is positional) and simple
    * un-quoted headers.
    */
  def evolveSchema(
      spark: SparkSession,
      srcDir: String,
      base: StructType,
      schemaLocation: String): StructType = {
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val persisted: Seq[String] = {
      val p = new Path(schemaLocation)
      if (fs.exists(p)) {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in).getLines().toList
        finally in.close()
      } else Seq.empty
    }

    // per-file headers, kept separate so divergent evolutions can be
    // detected (CSV parsing under a pinned schema is positional: two
    // files each appending a DIFFERENT new column cannot both parse
    // correctly under one merged schema — fail loudly instead of
    // silently writing one file's values into the other file's column)
    val headers: Seq[(String, Seq[String])] = {
      val src = new Path(srcDir)
      if (!fs.exists(src)) Seq.empty
      else fs.listStatus(src).filter(s => s.isFile && s.getPath.getName.endsWith(".csv"))
        .toSeq.flatMap { s =>
          val in = fs.open(s.getPath)
          try {
            val header = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, "UTF-8")).readLine()
            if (header == null) None
            else Some(s.getPath.getName -> header.split(",").map(_.trim).toSeq)
          } finally in.close()
        }
    }

    val known = base.fieldNames.toSet
    val extras = (persisted ++ headers.flatMap(_._2)).distinct.filterNot(known)
    val evolved = StructType(base.fields ++
      extras.map(org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType, nullable = true)))

    headers.foreach { case (file, h) =>
      val expect = evolved.fieldNames.take(h.length).toSeq
      if (h != expect)
        throw new IllegalStateException(
          s"schema evolution conflict in $file: header (${h.mkString(",")}) is not a " +
            s"prefix of the evolved schema (${evolved.fieldNames.mkString(",")}) — " +
            "positional CSV parsing would put values in the wrong columns")
    }

    if (extras.nonEmpty) {
      val out = fs.create(new Path(schemaLocation), true)
      try out.write((extras.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    evolved
  }

  /** csvToBronze with schema evolution: resolve the current schema
    * (pinned ∪ persisted ∪ newly discovered), then ingest. Bronze
    * grows new columns over time; read it back with `Table.readMerged`
    * so pre-evolution files surface the new columns as NULL.
    */
  def csvToBronzeEvolving(
      spark: SparkSession,
      srcDir: String,
      base: StructType,
      bronze: TableRef,
      checkpoint: String,
      schemaLocation: String): StructType = {
    val evolved = evolveSchema(spark, srcDir, base, schemaLocation)
    csvToBronze(spark, srcDir, evolved, bronze, checkpoint)
    evolved
  }

  /** S2 — dynamic table discovery (`01:16-20`): every subdirectory of
    * the ingest root is a table's CSV drop zone.
    */
  def discoverTables(spark: SparkSession, ingestRoot: String): Seq[String] = {
    val path = new Path(ingestRoot)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** The reference's multi-table ingestion loop (`01:16-31` + per-table
    * merge): discover table subdirs under `ingestRoot`, ingest every one
    * with a registered Entity schema into its bronze table. Returns the
    * table names ingested.
    */
  def ingestAll(spark: SparkSession, ingestRoot: String, roots: LakeRoots): Seq[String] =
    discoverTables(spark, ingestRoot).flatMap { name =>
      Entities.byName(name).map { e =>
        csvToBronze(spark, s"$ingestRoot/$name", e.bronzeSchema,
          roots.bronzeRef(name), s"${roots.checkpoints}/$name")
        name
      }
    }

  /** Incremental silver refresh: tails the bronze table as a stream
    * (S5) and applies cleanse + LWW upsert per micro-batch — the
    * reference's `02:20-101` shape, parameterized by the entity builder.
    */
  def bronzeToSilver(
      spark: SparkSession,
      bronze: TableRef,
      bronzeSchema: StructType,
      silver: TableRef,
      checkpoint: String,
      keys: Seq[String],
      cleanse: DataFrame => DataFrame): Unit = {
    val stream = spark.readStream.schema(bronzeSchema).parquet(bronze.dir)
    runAvailableNow(stream, checkpoint) { (batch, _) =>
      if (!batch.isEmpty) {
        Silver.upsertInto(spark, silver, cleanse(batch), keys)
      }
    }
  }

  /** `bronzeToSilver` with a hash-bucketed target: per micro-batch only
    * the buckets the batch's keys land in are rewritten
    * (graft.table.Bucketed), so an incremental refresh costs
    * O(batch + touched buckets), not O(silver table) — the same file
    * pruning the reference's Delta MERGE provided (`02:67-87`).
    *
    * Cleansing runs per micro-batch, so this path is ONLY correct for
    * row-local cleansers (where per-batch cleanse + LWW merge equals a
    * full recleanse). Do NOT route aggregated-grain entities here: a
    * key re-seen in a later batch would be re-aggregated from that
    * batch alone and LWW-replace its all-history row, making silver
    * depend on file arrival order. `Lake.refreshSilver` routes
    * `Entity.aggregatedGrain` entities through a full recleanse
    * instead.
    */
  def bronzeToSilverBucketed(
      spark: SparkSession,
      bronze: TableRef,
      bronzeSchema: StructType,
      silver: graft.table.BucketedRef,
      checkpoint: String,
      cleanse: DataFrame => DataFrame,
      zone: Option[graft.table.ZoneSpec] = None): Unit = {
    val stream = spark.readStream.schema(bronzeSchema).parquet(bronze.dir)
    runAvailableNow(stream, checkpoint) { (batch, _) =>
      if (!batch.isEmpty) {
        Silver.upsertIntoBucketed(spark, silver, cleanse(batch), zone)
      }
    }
  }
}
