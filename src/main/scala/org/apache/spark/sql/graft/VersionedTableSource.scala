/** Log-driven streaming source over graft versioned tables — the
  * `spark.readStream.format("graft-versioned")` analog of Delta's
  * streaming source (reference sites `02_bronze_to_silver.py:20-24,
  * 122-126,253-257` tail Delta tables as streams at every silver
  * ingest).
  *
  * WHY THIS PACKAGE: the DSv1 `Source` contract requires `getBatch` to
  * return a DataFrame whose logical plan is flagged `isStreaming`, and
  * the constructors for such frames (`Dataset.ofRows` over a
  * streaming-flagged relation) are `private[sql]`. Spark's own V1
  * connectors solve this by living in a subpackage of
  * `org.apache.spark.sql` (e.g. `org.apache.spark.sql.kafka010`);
  * this file follows that established pattern and contains ONLY the
  * Spark-API bridge — all table/log semantics stay in
  * [[graft.table.Versioned]].
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SQLContext}

import graft.table.Versioned

/** `format("graft-versioned")` registration (also reachable by the
  * fully-qualified class name). Required option: `path` — the versioned
  * table directory. Optional:
  *
  *  - `startingVersion` — tail the LOG from after this version (0 =
  *    from the table's first commit), requiring the tailed window to be
  *    append-only; Delta's option of the same name. When ABSENT the
  *    source takes Delta's default instead: the first batch is the
  *    table's full CURRENT SNAPSHOT (so a table whose history holds
  *    rewrites/deletes can still start streaming), and the log is
  *    tailed from there.
  *  - `skipChangeCommits` (default false) — skip row-mutating commits
  *    entirely instead of stopping the stream, Delta's option of the
  *    same name.
  *  - `maxVersionsPerTrigger` — admission control for continuous
  *    triggers: at most this many log versions per micro-batch once the
  *    stream is flowing (the maxFilesPerTrigger analog at this
  *    source's commit-range granularity). The first batch after a
  *    (re)start is uncapped — a V1 source cannot see the engine's
  *    committed offset before its first `getBatch`, and capping blind
  *    could regress below it; under `Trigger.AvailableNow` the wrapper
  *    snapshots one end offset, so the cap never engages there.
  *  - `readChangeFeed` (default false) — Delta's option of the same
  *    name: each micro-batch emits the ROW-LEVEL CHANGE FEED of its
  *    commit window (`Versioned.changes` — inserts/deletes with a
  *    `_change_type` column, an update as a delete+insert pair)
  *    instead of the insert-only add-action rows, so row-MUTATING
  *    commits stream instead of stopping the stream. The first batch
  *    (or an explicit `startingVersion 0`) is the full snapshot as
  *    `insert` rows — Delta's initial-snapshot rule. Mutually
  *    exclusive with `skipChangeCommits` (skipping mutations and
  *    representing them are opposite answers to the same commits).
  */
final class VersionedTableSourceProvider
    extends StreamSourceProvider with StreamSinkProvider with DataSourceRegister
    with VersionedBatchTableProvider {

  override def shortName(): String = "graft-versioned"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned source requires option(\"path\", <versioned table dir>)"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val resolved = schema.getOrElse {
      val head = Versioned.currentVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(
          s"no committed versions at $dir — the versioned streaming source " +
            "needs an existing table (or pass an explicit schema)"))
      val base = Versioned.schemaAt(spark, dir, head).getOrElse(
        Versioned.readAt(spark, dir, head).schema)
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        base.add("_change_type", org.apache.spark.sql.types.StringType,
          nullable = false)
      else base
    }
    (shortName(), resolved)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    val dir = pathOf(parameters)
    require(!(parameters.contains("startingVersion") &&
      parameters.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    // startingTimestamp (Delta's option): begin at the FIRST commit at
    // or after the instant — resolved once at source creation (offsets
    // then carry versions, so checkpoint restarts never re-resolve a
    // wall clock). Like startingVersion, it suppresses the
    // initial-snapshot batch: the consumer asked for changes SINCE an
    // instant, not the table's full content.
    val starting = parameters.get("startingVersion").map(_.toLong)
      .orElse(parameters.get("startingTimestamp").map(t =>
        Versioned.versionSince(
          spark, dir, Versioned.parseTimestampMillis(t)) - 1L))
    val skipChanges = parameters.get("skipChangeCommits").exists(_.toBoolean)
    val changeFeed = parameters.get("readChangeFeed").exists(_.toBoolean)
    require(!(changeFeed && skipChanges),
      "readChangeFeed and skipChangeCommits are mutually exclusive — the " +
        "change feed REPRESENTS row-mutating commits (delete+insert pairs); " +
        "skipChangeCommits ignores them")
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxVersions.foreach(m => require(m > 0, s"maxVersionsPerTrigger must be > 0: $m"))
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new VersionedTableSource(
      spark, dir, pinned, starting, skipChanges, maxVersions, changeFeed)
  }

  /** The WRITE half (`df.writeStream.format("graft-versioned")`) — the
    * reference's `writeStream.format("delta")` shape: each micro-batch
    * lands as ONE idempotent append commit watermarked by
    * (`txnAppId`, batchId) in the target table's own log, so retried
    * epochs and checkpoint-wiped re-runs over unchanged input never
    * duplicate rows (the `Ingest.sinkVersionedExactlyOnce` contract,
    * now reachable without foreachBatch). Append output mode only:
    * complete/update would need MERGE semantics — route those through
    * `foreachBatch` + `Versioned.mergeIdempotent` explicitly.
    * `txnAppId` defaults to a checkpoint-location-derived id (each
    * checkpointed query IS one logical writer); pass it explicitly
    * when two checkpoints must share a watermark lineage.
    */
  override def createSink(
      sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-versioned sink supports Append output mode only, got $outputMode — " +
        "complete/update need MERGE semantics; use foreachBatch with " +
        "Versioned.mergeIdempotent")
    require(partitionColumns.isEmpty,
      "graft-versioned tables do not take partition columns (clustering + " +
        "zone maps are the layout story — see Versioned's scaladoc)")
    val dir = pathOf(parameters)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation").map(c => s"graft-sink:$c"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-versioned sink needs option(\"txnAppId\", ...) (or a " +
          "checkpointLocation to derive one from)"))
    new VersionedTableSink(
      sqlContext.sparkSession.asInstanceOf[SparkSession], dir, appId)
  }
}

/** One micro-batch = one idempotent append commit; see
  * [[VersionedTableSourceProvider.createSink]].
  */
final class VersionedTableSink(spark: SparkSession, dir: String, appId: String)
    extends Sink {

  override def addBatch(batchId: Long, data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit = {
    // the engine hands a streaming-planned frame; re-wrap its executed
    // RDD as a batch frame (the standard V1-sink move) so the table
    // layer's ordinary write path applies
    val classic = data.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val batch = spark.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
    Versioned.appendIdempotent(batch, dir, appId, batchId)
    ()
  }

  override def toString: String = s"VersionedTableSink[$dir, $appId]"
}

/** One micro-batch = one commit range of the table's log: offsets ARE
  * log versions. The FIRST batch is either the full current snapshot
  * (`startingVersion` absent — Delta's default, so pre-existing
  * rewrites in history don't block stream start) or the tail window
  * from the requested version; every later batch is
  * [[graft.table.Versioned.streamBatch]] — append commits' add-action
  * files read as data, row-preserving maintenance (optimize/compact)
  * contributing nothing, row-mutating commits failing the stream loudly
  * unless `skipChangeCommits` opted out. Restart semantics come
  * entirely from the checkpoint's offset log: a replayed range
  * re-reads the SAME immutable snapshot/files (log entries never
  * change), so recovery is exactly-once into any idempotent sink.
  */
final class VersionedTableSource(
    spark: SparkSession, dir: String, pinned: StructType,
    startingVersion: Option[Long], skipChangeCommits: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    changeFeed: Boolean = false)
    extends Source {

  override def schema: StructType = pinned

  /** Tail floor for the very first batch; snapshot mode resolves the
    * whole first window as one `readAt`.
    */
  private val tailFrom: Long = startingVersion.getOrElse(0L)
  private val initialSnapshot: Boolean = startingVersion.isEmpty

  /** Highest end offset this source has HANDED OUT via getBatch —
    * the rate-limit base. Never consulted before the first getBatch
    * (the engine's committed offset is unknowable then, and a blind
    * cap could regress below it — see the provider scaladoc).
    */
  @volatile private var lastSeenEnd: Option[Long] = None

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[V1Offset] =
    Versioned.currentVersion(spark, dir).filter(_ > tailFrom).map { head =>
      val capped = (maxVersionsPerTrigger, lastSeenEnd) match {
        case (Some(m), Some(seen)) => math.min(head, seen + m)
        case _ => head
      }
      LongOffset(capped)
    }

  /** CDF micro-batch for the window `(from, to]`: the snapshot diff
    * (`Versioned.changes` — O(changed files)), except from the table's
    * birth (`from == 0`), where "diff against nothing" is the full
    * snapshot as `insert` rows — which also serves as Delta's
    * initial-snapshot batch when `startingVersion` is absent. With
    * `maxVersionsPerTrigger` the window arrives in sub-windows, each
    * diffed independently — per-commit-range changes, Delta's own
    * streaming-CDF granularity (a row inserted then deleted across two
    * sub-windows emits both rows; the one-window diff would cancel
    * them — both are faithful feeds, the chunked one strictly finer).
    */
  private def cdfBatch(from: Long, to: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    if (from == 0L)
      Versioned.readAt(spark, dir, to).withColumn("_change_type", lit("insert"))
    else
      // the four-type feed: key-bearing rewrites (merge, UPDATE) pair
      // their removed/added rows as update_preimage/update_postimage.
      // The per-commit version tag is dropped to keep the streaming
      // schema stable across restarts (the offset already scopes the
      // window); the BATCH CDF surface carries it.
      Versioned.changesWithType(spark, dir, from, to).drop("_commit_version")
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = versionOf(end)
    val batch = (start, changeFeed) match {
      case (s, true) =>
        cdfBatch(s.map(versionOf).getOrElse(if (initialSnapshot) 0L else tailFrom), to)
      case (None, false) if initialSnapshot =>
        // Delta-default initial batch: the full snapshot at `to` —
        // history before it (including rewrites) is irrelevant, and
        // the snapshot is immutable so a checkpoint replay of this
        // batch reproduces it bit-for-bit
        Versioned.readAt(spark, dir, to)
      case (s, false) =>
        val from = s.map(versionOf).getOrElse(tailFrom)
        Versioned.streamBatch(spark, dir, from, to, skipChangeCommits)
    }
    lastSeenEnd = Some(lastSeenEnd.fold(to)(math.max(_, to)))
    // bind the SOURCE's pinned schema: a mergeSchema append inside the
    // window widens the batch frame, but a running stream's output
    // signature is fixed at start — new columns are dropped until the
    // stream restarts (Delta's schema-evolution-on-restart rule)
    import org.apache.spark.sql.functions.col
    toStreaming(batch.select(pinned.fieldNames.map(col).toSeq: _*))
  }

  /** Re-flags the batch plan's file relation as streaming — the DSv1
    * `getBatch` contract. The plan stays a real file relation, so
    * downstream column pruning and filter pushdown still reach the
    * parquet scan per micro-batch. Plans without a re-flaggable
    * relation leaf (the empty-window frame is a LogicalRDD, DV-bearing
    * snapshots add a join) fall back to wrapping the executed RDD,
    * which is how Spark's own Kafka source builds its batch frames.
    */
  private def toStreaming(df: DataFrame): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val relationLeaves = analyzed.collectLeaves().count(_.isInstanceOf[LogicalRelation])
    val plan = analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    // plan surgery is only sound when the file relation is the ONE leaf
    // (the plain scan shape); anything else — joins (DV subtraction),
    // empty-window LogicalRDDs — wraps the executed RDD instead
    if (relationLeaves == 1 && plan.isStreaming) Dataset.ofRows(spark, plan)
    else spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"VersionedTableSource[$dir]"
}

/** Test/ops introspection needing `private[sql]` access: the physical
  * plan a streaming query last executed — how the plan audits prove
  * that filters and column pruning pushed through the versioned
  * source's spliced relation into the per-micro-batch parquet scan.
  */
object StreamingIntrospection {

  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String =
    q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        Option(w.streamingQuery.lastExecution)
          .map(_.executedPlan.toString).getOrElse("")
      case other =>
        throw new IllegalArgumentException(
          s"not a wrapped streaming query: ${other.getClass.getName}")
    }
}
