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

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  *    source's commit-range granularity). The engine drives the source
  *    through `SupportsAdmissionControl.latestOffset`, which receives
  *    the stream's start offset — so every batch is capped, including
  *    the first after a restart, and `Trigger.AvailableNow` drains the
  *    backlog in capped chunks to a head latched at prepare time
  *    (`SupportsTriggerAvailableNow`, the FileStreamSource pattern).
  *    Only the legacy `getOffset` path — direct drivers, not the
  *    engine — keeps an uncapped first offer (it cannot see the
  *    committed offset, and capping blind could regress below it).
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger` — INITIAL-SNAPSHOT
  *    admission control, Delta's options of the same names: the
  *    default first batch is the table's full current snapshot, which
  *    at 100 TB is ~10⁶ files in ONE micro-batch — an un-startable
  *    stream. With either option set the snapshot is admitted in
  *    chunks of at most this many files (respectively: files totalling
  *    at most this many bytes, always at least one file — Delta's
  *    soft-max rule), each chunk one micro-batch with its own offset
  *    `{"version":v,"index":i}` — an index into the snapshot's
  *    deterministic file order ([[graft.table.Versioned.snapshotFileOrder]]),
  *    Delta's `DeltaSourceOffset(reservoirVersion, index)` shape. Once
  *    the snapshot drains the source tails the log exactly as before
  *    (plain version offsets; combine with `maxVersionsPerTrigger` to
  *    cap that phase). Chunk progress survives restarts through a
  *    marker under the source's checkpoint metadata dir (written in
  *    `getBatch`, so it never runs ahead of the engine's offset log)
  *    AND by the engine handing `latestOffset` the start offset.
  *    Requires the snapshot phase: rejected with `startingVersion`/
  *    `startingTimestamp`, whose streams tail the log from a version
  *    and never read a snapshot. `Trigger.AvailableNow` drains the
  *    snapshot in admission-sized chunks to the prepare-time latch —
  *    at 100 TB, "catch up this table once" runs as ~10⁶/maxFiles
  *    bounded batches instead of one unbounded one.
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
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toLong)
    maxFiles.foreach(m => require(m > 0, s"maxFilesPerTrigger must be > 0: $m"))
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxBytes.foreach(m => require(m > 0, s"maxBytesPerTrigger must be > 0: $m"))
    require(starting.isEmpty || (maxFiles.isEmpty && maxBytes.isEmpty),
      "maxFilesPerTrigger/maxBytesPerTrigger chunk the INITIAL-SNAPSHOT " +
        "batch; with startingVersion/startingTimestamp the stream tails the " +
        "log and never reads a snapshot — cap that phase with " +
        "maxVersionsPerTrigger instead")
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new VersionedTableSource(
      spark, dir, pinned, starting, skipChanges, maxVersions, changeFeed,
      maxFiles, maxBytes, Option(metadataPath))
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
/** A partially-admitted initial snapshot: `index` files of
  * [[graft.table.Versioned.snapshotFileOrder]] at `version` have been
  * handed out. Serialized as `{"version":v,"index":i}`; the tail phase
  * keeps plain long-serialized version offsets, so checkpoints written
  * before this offset existed (and streams never using file admission)
  * parse unchanged.
  */
final case class SnapshotSliceOffset(version: Long, index: Long) extends V1Offset {
  override def json: String = s"""{"version":$version,"index":$index}"""
}

final class VersionedTableSource(
    spark: SparkSession, dir: String, pinned: StructType,
    startingVersion: Option[Long], skipChangeCommits: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    changeFeed: Boolean = false,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None)
    extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def schema: StructType = pinned

  /** Tail floor for the very first batch; snapshot mode resolves the
    * whole first window as one `readAt`.
    */
  private val tailFrom: Long = startingVersion.getOrElse(0L)
  private val initialSnapshot: Boolean = startingVersion.isEmpty
  private val chunkedSnapshot: Boolean =
    initialSnapshot && (maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty)

  /** Highest end offset this source has HANDED OUT via getBatch —
    * the rate-limit base. Never consulted before the first getBatch
    * (the engine's committed offset is unknowable then, and a blind
    * cap could regress below it — see the provider scaladoc).
    */
  @volatile private var lastSeenEnd: Option[Long] = None

  /** Offset positions in admission order: every snapshot slice of a
    * version precedes that version's tail offsets (`Slice(v, i)` ≺
    * `Slice(v, j)` for i<j ≺ `Tail(w)` for w ≥ v).
    */
  private sealed trait Pos
  private final case class Slice(v: Long, idx: Long) extends Pos
  private final case class Tail(v: Long) extends Pos

  private def posOf(o: OffsetV2): Pos = {
    val j = (o match {
      case l: LongOffset => return Tail(l.offset)
      case s: SerializedOffset => s.json
      case other => other.json
    }).trim
    if (j.startsWith("{")) {
      val m = """"version"\s*:\s*(\d+).*"index"\s*:\s*(\d+)""".r
        .findFirstMatchIn(j).getOrElse(throw new IllegalArgumentException(
          s"unparseable graft-versioned offset: $j"))
      Slice(m.group(1).toLong, m.group(2).toLong)
    } else Tail(j.toLong)
  }

  private def versionOf(o: V1Offset): Long = posOf(o) match {
    case Tail(v) => v
    case Slice(v, _) => v
  }

  // ---- initial-snapshot admission (maxFilesPerTrigger/maxBytesPerTrigger)
  //
  // The snapshot is pinned ONCE (version + deterministic file order +
  // sizes when byte-capped) and admitted as index ranges. The pin
  // survives restarts through the progress marker: an empty file named
  // `p-<version>-<index>` under the source's checkpoint metadata dir,
  // created in getBatch — the name IS the record (a torn write cannot
  // corrupt it), and because the engine writes its offset log BEFORE
  // calling getBatch, the marker never runs ahead of a batch the
  // engine could replay. Without the marker a restart would re-pin the
  // snapshot at the CURRENT head, and a checkpoint holding
  // `{"version":v0,...}` against a moved head would mix two different
  // file orders in one stream.

  private final case class SnapState(v0: Long, n: Long, cumBytes: Option[Array[Long]])
  @volatile private var snap: Option[SnapState] = None
  /** Last slice index the engine has PROCESSED through getBatch (or
    * recovered from the marker); the next chunk boundary's base.
    */
  @volatile private var sliceSeen: Option[Slice] = None

  private def posLt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def markerDir: Option[Path] = metadataPath.map(p => new Path(p, "graft-progress"))

  private def readMarker(): Option[Slice] = markerDir.flatMap { md =>
    val f = md.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(md)) None
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("p-") =>
        val parts = s.stripPrefix("p-").split("-")
        Slice(parts(0).toLong, parts(1).toLong)
      }
      .sortBy(s => (s.v, s.idx)).lastOption
  }

  private def writeMarker(s: Slice): Unit = markerDir.foreach { md =>
    val f = md.getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(md, s"p-${s.v}-${s.idx}")
    if (!f.exists(p)) f.create(p, true).close()
    // best-effort sweep of superseded markers (the max-by-name read
    // tolerates leftovers; this just bounds the listing)
    f.listStatus(md).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("p-") && nm != s"p-${s.v}-${s.idx}") {
        val parts = nm.stripPrefix("p-").split("-")
        if (posLt((parts(0).toLong, parts(1).toLong), (s.v, s.idx)))
          f.delete(st.getPath, false)
      }
    }
  }

  private def resolveSnap(pinV: Option[Long]): SnapState = snap match {
    case Some(st) => st
    case None =>
      // pin preference: an offset/marker-carried version, then the
      // AvailableNow latch (commits racing the drain must not widen
      // the snapshot), then the live head
      val v0 = pinV.orElse(availableNowCap.filter(_ > 0)).getOrElse(
        Versioned.currentVersion(spark, dir).getOrElse(
          throw new IllegalArgumentException(
            s"no committed versions at $dir")))
      val n = Versioned.snapshotFileOrder(spark, dir, v0).size.toLong
      val cum = maxBytesPerTrigger.map { _ =>
        Versioned.snapshotFileSizes(spark, dir, v0)
          .scanLeft(0L)(_ + _).toArray // cum(i) = bytes of files [0, i)
      }
      val st = SnapState(v0, n, cum)
      snap = Some(st)
      st
  }

  /** Next admission boundary after `cur` under the file/byte caps:
    * at most maxFiles files, at most maxBytes bytes — but always at
    * least one file (Delta's soft-max rule, so one oversized file
    * cannot wedge the stream).
    */
  private def nextBoundary(st: SnapState, cur: Long): Long = {
    val byFiles = maxFilesPerTrigger.map(m => cur + m).getOrElse(st.n)
    val byBytes = (maxBytesPerTrigger, st.cumBytes) match {
      case (Some(mb), Some(cum)) =>
        var j = cur + 1 // always admit one
        while (j < st.n && cum(math.toIntExact(j + 1)) - cum(math.toIntExact(cur)) <= mb)
          j += 1
        j
      case _ => st.n
    }
    math.min(st.n, math.min(byFiles, byBytes))
  }

  /** The snapshot-phase offer, or None when the snapshot has fully
    * drained (tail phase takes over).
    */
  private def snapshotOffset(): Option[V1Offset] = {
    val seen = sliceSeen.orElse(readMarker())
    seen.foreach(s => sliceSeen = Some(s))
    seen match {
      case Some(Slice(v, i)) =>
        val st = resolveSnap(Some(v))
        if (i >= st.n) None
        else Some(SnapshotSliceOffset(st.v0, nextBoundary(st, i)))
      case None =>
        val st = resolveSnap(None)
        Some(SnapshotSliceOffset(st.v0, nextBoundary(st, 0L)))
    }
  }

  /** Log-tail offer over `floor`, clamped to the AvailableNow latch
    * when one is armed and rate-capped from `rateBase` when
    * maxVersionsPerTrigger is set.
    */
  private def tailOffer(floor: Long, rateBase: Option[Long]): Option[V1Offset] =
    Versioned.currentVersion(spark, dir)
      .map(h => availableNowCap.fold(h)(math.min(h, _)))
      .filter(_ > floor)
      .map { head =>
        val capped = (maxVersionsPerTrigger, rateBase) match {
          case (Some(m), Some(seen)) => math.min(head, seen + m)
          case _ => head
        }
        LongOffset(capped)
      }

  private def tailFloor: Long =
    if (chunkedSnapshot) snap.map(_.v0).getOrElse(tailFrom) else tailFrom

  override def getOffset: Option[V1Offset] = {
    if (chunkedSnapshot && !tailStarted) snapshotOffset() match {
      case Some(o) => return Some(o)
      case None => // snapshot drained — tail the log below
    }
    tailOffer(tailFloor, lastSeenEnd)
  }

  // ---- SupportsAdmissionControl / SupportsTriggerAvailableNow --------
  //
  // The engine prefers this contract over the plain-Source one: it
  // hands `latestOffset` the stream's START offset (committed or last
  // planned), which the V1 `getOffset` can never see — so on this path
  // EVERY batch is admission-capped, including the first after a
  // restart (the getOffset path keeps its documented uncapped first
  // offer for direct drivers). Implementing SupportsTriggerAvailableNow
  // also replaces the engine's one-shot wrapper: Trigger.AvailableNow
  // drains in admission-sized chunks to a head latched at prepare time,
  // instead of one giant latched batch.

  /** Head version latched by `prepareForTriggerAvailableNow` (0 = the
    * table had no commits at prepare — offer nothing this run).
    */
  @volatile private var availableNowCap: Option[Long] = None

  /** True once the engine's start offset was a plain version — the
    * stream is past any snapshot phase (e.g. a pre-admission checkpoint
    * restarted WITH chunking options: re-opening the snapshot would
    * re-emit every row).
    */
  @volatile private var tailStarted = false

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Versioned.currentVersion(spark, dir).getOrElse(0L))

  /** Admission is driven by this source's own options (the
    * FileStreamSource/Delta pattern); the engine's limit plumbing
    * stays inert.
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    Option(startOffset).map(posOf).foreach {
      case s @ Slice(v, i) =>
        if (sliceSeen.forall(p => posLt((p.v, p.idx), (v, i)))) sliceSeen = Some(s)
      case Tail(v) =>
        tailStarted = true
        if (lastSeenEnd.forall(_ < v)) lastSeenEnd = Some(v)
    }
    if (availableNowCap.exists(_ <= 0)) return startOffset
    // version-rate base: the engine-seeded progress, else the floor —
    // EXCEPT the un-chunked initial-snapshot first batch, which is one
    // whole snapshot by definition (a version cap there would change
    // which snapshot it is, and could expose mid-history mutations the
    // snapshot read was designed to absorb)
    val rateBase = lastSeenEnd.orElse(
      if (initialSnapshot && !chunkedSnapshot && !tailStarted) None
      else Some(tailFloor))
    val next: Option[V1Offset] =
      if (chunkedSnapshot && !tailStarted)
        snapshotOffset().orElse(tailOffer(tailFloor, rateBase))
      else tailOffer(tailFloor, rateBase)
    // same-as-start (or null) signals "no new data" to the engine
    next.map(o => o: OffsetV2).getOrElse(startOffset)
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

  /** One snapshot-phase micro-batch: files `[fromIdx, untilIdx)` of the
    * pinned snapshot's admission order; CDF mode tags the rows `insert`
    * (Delta's initial-snapshot rule, chunked).
    */
  private def sliceBatch(v0: Long, fromIdx: Long, untilIdx: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val s = Versioned.readSnapshotSlice(spark, dir, v0, fromIdx, untilIdx)
    if (changeFeed) s.withColumn("_change_type", lit("insert")) else s
  }

  /** The log-tail micro-batch `(from, to]` in the running mode. */
  private def tailBatch(from: Long, to: Long): DataFrame =
    if (changeFeed) cdfBatch(from, to)
    else Versioned.streamBatch(spark, dir, from, to, skipChangeCommits)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = versionOf(end)
    val batch = (start.map(posOf), posOf(end)) match {
      case (s, Slice(v0, i2)) =>
        // snapshot-phase chunk; a None start is the first chunk
        val i1 = s match {
          case Some(Slice(`v0`, i)) => i
          case None => 0L
          case other => throw new IllegalStateException(
            s"snapshot-slice end $end cannot follow offset $other")
        }
        sliceBatch(v0, i1, i2)
      case (Some(Slice(v0, i)), Tail(v)) =>
        // crossing from the snapshot phase into the tail: whatever the
        // checkpoint left un-admitted of the pinned snapshot, then the
        // log window — one frame, so a restart that dropped the
        // admission options (or an engine skipping the final slice
        // offset) still emits every snapshot row exactly once
        val st = resolveSnap(Some(v0))
        val rest = if (i < st.n) Some(sliceBatch(v0, i, st.n)) else None
        val tail = tailBatch(v0, v)
        rest.fold(tail)(_.unionByName(tail))
      case (s, Tail(_)) => (s, changeFeed) match {
        case (sp, true) =>
          cdfBatch(sp.map { case Tail(v) => v case Slice(v, _) => v }
            .getOrElse(if (initialSnapshot) 0L else tailFrom), to)
        case (None, false) if initialSnapshot =>
          // Delta-default initial batch: the full snapshot at `to` —
          // history before it (including rewrites) is irrelevant, and
          // the snapshot is immutable so a checkpoint replay of this
          // batch reproduces it bit-for-bit
          Versioned.readAt(spark, dir, to)
        case (sp, false) =>
          val from = sp.map { case Tail(v) => v case Slice(v, _) => v }
            .getOrElse(tailFrom)
          Versioned.streamBatch(spark, dir, from, to, skipChangeCommits)
      }
    }
    posOf(end) match {
      case s @ Slice(v, i) =>
        if (sliceSeen.forall(p => posLt((p.v, p.idx), (v, i)))) sliceSeen = Some(s)
        writeMarker(s)
      case Tail(_) => ()
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
