package graft.table

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-backed versioned table: the Delta-transaction-log analog the
  * plain `Table` layer (write-temp + rename) deliberately omits.
  *
  * Layout:
  * {{{
  *   <dir>/_graft_log/v00000001.json   // snapshot: full data-file list
  *   <dir>/d-<uuid>/part-*.parquet     // immutable data-file sets
  * }}}
  *
  * Every commit writes a NEW data directory (files are never mutated or
  * renamed) and then publishes a complete snapshot listing as the next
  * log entry via an atomic temp-file rename. Readers resolve the file
  * list from the log, never from directory listing — which is what
  * makes this the scale shape: at 100 TB a recursive listing of
  * millions of data files is the slowest part of query planning, while
  * the log read is one small file. It also yields
  *
  *  - snapshot isolation: a reader planning against version N keeps a
  *    consistent file set however many commits land meanwhile;
  *  - time travel: `readAt(v)` reproduces any retained version —
  *    including pre-overwrite data, since overwrite only publishes a
  *    snapshot that stops referencing old files, it deletes nothing;
  *  - crash safety: data files written by a failed commit are invisible
  *    (no snapshot references them) and are swept by `vacuum`.
  *
  * Single-writer by contract (like the rest of the table layer):
  * concurrent committers would race on the next version number; a
  * multi-writer deployment puts a lock service or conditional-put in
  * front of the log directory, exactly as Delta does on S3.
  *
  * Reference sites being emulated: Delta's `VERSION AS OF` /
  * `deltaTable.vacuum()` that the reference's storage format provides
  * implicitly (`01_bronze_csv_to_delta.py:49-56` writes, `02:394-398`
  * reads).
  */
object Versioned {

  private val LogDir = "_graft_log"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logPath(dir: String) = new Path(dir, LogDir)

  private def versionFile(dir: String, v: Long) =
    new Path(logPath(dir), f"v$v%08d.json")

  /** All committed versions, ascending; empty for a non-table. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(logPath(dir))) Seq.empty
    else f.listStatus(logPath(dir)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** Reads a small log/sidecar file fully as UTF-8. */
  private def readFully(spark: SparkSession, dir: String, p: Path): String = {
    val in = fs(spark, dir).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def snapshotJson(spark: SparkSession, dir: String, v: Long): String = {
    val p = versionFile(dir, v)
    require(fs(spark, dir).exists(p),
      s"version $v does not exist (vacuumed or never committed) at $dir")
    readFully(spark, dir, p)
  }

  /** Data files (table-relative paths) of snapshot `v`. */
  def filesAt(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    // minimal parse of {"version":N,...,"files":["a","b"]} — files are
    // uuid/part names we wrote ourselves (no quotes/escapes)
    val files = snapshotJson(spark, dir, v).split("\"files\":\\[", 2)(1).split("]", 2)(0)
    if (files.trim.isEmpty) Seq.empty
    else files.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  /** Latest snapshot scan. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $dir")))

  /** Time-travel scan of snapshot `v` (Delta `VERSION AS OF v`). */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val files = filesAt(spark, dir, v)
    if (files.isEmpty) {
      // an empty DataFrame writes no part files, so the snapshot keeps
      // the SCHEMA in its log entry (base64 of StructType.json) —
      // without it an empty version would surface 0 columns and break
      // changes()/compact()/readWhere() against it
      val json = snapshotJson(spark, dir, v)
      val schema = json.split("\"schema\":\"", 2) match {
        case Array(_, rest) =>
          val b64 = rest.split("\"", 2)(0)
          org.apache.spark.sql.types.DataType
            .fromJson(new String(
              java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
        case _ => new org.apache.spark.sql.types.StructType() // pre-schema log entry
      }
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Writer-transaction watermarks carried by snapshot `v`: the highest
    * transaction version each named application has committed. The
    * Delta `txnAppId`/`txnVersion` analog that makes streaming sinks
    * exactly-once: a replayed micro-batch re-presents an already-seen
    * (app, version) and is refused before any snapshot is published.
    */
  def txnsAt(spark: SparkSession, dir: String, v: Long): Map[String, Long] = {
    val json = snapshotJson(spark, dir, v)
    json.split("\"txns\":\\{", 2) match {
      case Array(_, rest) =>
        val body = rest.split("}", 2)(0).trim
        if (body.isEmpty) Map.empty
        else body.split(",").map { kv =>
          val Array(k, n) = kv.split(":", 2)
          k.trim.stripPrefix("\"").stripSuffix("\"") -> n.trim.toLong
        }.toMap
      case _ => Map.empty // pre-txn log entry
    }
  }

  /** Highest transaction version `appId` has committed, if any. */
  def lastTxnVersion(spark: SparkSession, dir: String, appId: String): Option[Long] =
    currentVersion(spark, dir).flatMap(v => txnsAt(spark, dir, v).get(appId))

  private def commit(
      spark: SparkSession, dir: String, files: Seq[String], op: String,
      schemaJson: String, txn: Option[(String, Long)] = None): Long = {
    val f = fs(spark, dir)
    f.mkdirs(logPath(dir))
    val prev = currentVersion(spark, dir)
    val v = prev.getOrElse(0L) + 1
    // txn watermarks carry forward through EVERY commit (append,
    // overwrite, compact): replacing data does not reset exactly-once
    // bookkeeping, or a compaction between two micro-batches would
    // let a replayed batch double-apply
    val txns = prev.map(txnsAt(spark, dir, _)).getOrElse(Map.empty) ++ txn
    val txnsJson =
      if (txns.isEmpty) ""
      else txns.toSeq.sorted
        .map { case (a, n) => s""""$a":$n""" }
        .mkString(""","txns":{""", ",", "}")
    val b64 = java.util.Base64.getEncoder
      .encodeToString(schemaJson.getBytes(StandardCharsets.UTF_8))
    val json =
      s"""{"version":$v,"op":"$op","schema":"$b64"$txnsJson,"files":[${files.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = new Path(logPath(dir), s".v$v.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    publishOnce(f, tmp, versionFile(dir, v))
    v
  }

  /** The atomicity point of every commit: publish `tmp` as `dest`,
    * refusing when `dest` already exists. Race detection cannot rely on
    * rename alone — RawLocalFileSystem (and object-store connectors)
    * OVERWRITE on rename, so a lost race would silently vanish the
    * winning committer's log entry. The version number was computed
    * from the log, so an existing destination means a concurrent writer
    * published it since; the loser deletes its temp and fails loudly.
    * This narrows (not closes) the check-then-rename window on
    * overwriting filesystems; true multi-writer needs a lock service or
    * conditional-put in front of the log, exactly as Delta on S3.
    */
  private[graft] def publishOnce(
      f: org.apache.hadoop.fs.FileSystem, tmp: Path, dest: Path): Unit = {
    if (f.exists(dest)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"commit of $dest lost a race — a concurrent writer published this " +
          "version first (single-writer contract violated); retry from the new log head")
    }
    if (!f.rename(tmp, dest))
      throw new IllegalStateException(
        s"commit of $dest lost a race — concurrent writer?")
  }

  /** Writes `df` as a fresh immutable file set and returns its
    * table-relative parquet paths (not yet referenced by any snapshot).
    */
  private def writeDataFiles(df: DataFrame, dir: String): Seq[String] = {
    // full UUID: an 8-hex prefix (~2^32 namespace) invites a birthday
    // collision at high commit counts, failing the write spuriously
    val sub = s"d-${UUID.randomUUID().toString}"
    df.write.parquet(s"$dir/$sub")
    val f = fs(df.sparkSession, dir)
    f.listStatus(new Path(dir, sub)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet"))
      .sorted
      .map(n => s"$sub/$n")
  }

  /** Append commit: next snapshot = previous files + the new set. */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val prev = currentVersion(spark, dir)
      .map(filesAt(spark, dir, _)).getOrElse(Seq.empty)
    commit(spark, dir, prev ++ writeDataFiles(df, dir), "append", df.schema.json)
  }

  /** Idempotent append (exactly-once sink contract): commits `df` tagged
    * with writer transaction (`appId`, `txnVersion`); if the table has
    * already committed `txnVersion` or later for `appId`, the call is a
    * no-op returning None — BEFORE writing data files, so a replayed
    * micro-batch costs a log read, not a write. This is how a
    * `foreachBatch(batchId => ...)` sink survives checkpoint replay
    * without duplicating rows (Delta's `txnAppId`/`txnVersion` option).
    *
    * Requires monotonically increasing `txnVersion` per `appId` (which
    * Structured Streaming's batchId provides).
    *
    * SINGLE-WRITER contract per `appId`: the watermark check and the
    * commit are not one atomic step, so two concurrent replays of the
    * SAME batch could both pass the check. Structured Streaming never
    * runs two instances of one query concurrently against one
    * checkpoint, which is the deployment this guards; a multi-writer
    * log needs a lock service / conditional-put (see [[commit]]).
    */
  def appendIdempotent(
      df: DataFrame, dir: String, appId: String, txnVersion: Long): Option[Long] = {
    require(appId.matches("[A-Za-z0-9_.:/-]+"),
      s"appId must be log-safe ([A-Za-z0-9_.:/-]+): $appId")
    val spark = df.sparkSession
    if (lastTxnVersion(spark, dir, appId).exists(_ >= txnVersion)) None
    else {
      val prev = currentVersion(spark, dir)
        .map(filesAt(spark, dir, _)).getOrElse(Seq.empty)
      Some(commit(spark, dir, prev ++ writeDataFiles(df, dir), "append",
        df.schema.json, Some(appId -> txnVersion)))
    }
  }

  /** Overwrite commit: next snapshot = the new set alone. Old versions
    * stay readable until `vacuum`.
    */
  def overwrite(df: DataFrame, dir: String): Long =
    commit(df.sparkSession, dir, writeDataFiles(df, dir), "overwrite", df.schema.json)

  /** Idempotent overwrite: `overwrite` guarded by the same writer-
    * transaction watermark as [[appendIdempotent]].
    */
  def overwriteIdempotent(
      df: DataFrame, dir: String, appId: String, txnVersion: Long): Option[Long] = {
    require(appId.matches("[A-Za-z0-9_.:/-]+"),
      s"appId must be log-safe ([A-Za-z0-9_.:/-]+): $appId")
    val spark = df.sparkSession
    if (lastTxnVersion(spark, dir, appId).exists(_ >= txnVersion)) None
    else Some(commit(spark, dir, writeDataFiles(df, dir), "overwrite",
      df.schema.json, Some(appId -> txnVersion)))
  }

  /** Compaction commit (OPTIMIZE analog on the versioned layout): the
    * current snapshot rewritten as one coalesced file set. Rows are
    * unchanged — the commit just swaps many small files for few big
    * ones; history before the compaction still time-travels.
    */
  def compact(spark: SparkSession, dir: String): Long =
    overwrite(read(spark, dir), dir)

  /** Z-order clustered compaction (Delta `OPTIMIZE ZORDER BY` analog):
    * rewrites the current snapshot range-partitioned and sorted along
    * the Morton curve of two long columns, then publishes zone maps
    * for BOTH. Files now cover tight rectangles of (x, y) space, so a
    * range predicate on either column prunes from the log — a plain
    * single-column sort can only serve its own column. Rows unchanged;
    * history still time-travels. The curve math is
    * [[graft.functions.ZOrder.zValue]] (low-31-bit domain — cluster on
    * ranks or offsets for wider columns).
    */
  def compactClustered(
      spark: SparkSession, dir: String,
      xCol: String, yCol: String, targetFiles: Int = 8): Long = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.ZOrder.zValue(col(xCol), col(yCol))
    val clustered = read(spark, dir)
      .withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val v = overwrite(clustered, dir)
    writeZoneMaps(spark, dir, v, Seq(xCol, yCol))
    v
  }

  /** Zone-map sidecar: per-file [min, max] of designated long-typed
    * columns, written next to a snapshot as `v<N>.zones.json`. The
    * data-skipping half of the Delta/Iceberg stats story: a reader
    * with a range predicate on a zoned column prunes files from the
    * LOG alone — zero data-file opens for planning, which at 100 TB is
    * the difference between touching 3 files and listing 3 million.
    * Stats cost one footer-cheap aggregate pass over only the files of
    * the commit being annotated, covering every requested column at
    * once.
    */
  def writeZoneMaps(
      spark: SparkSession, dir: String, v: Long, zoneCols: Seq[String]): Unit = {
    require(zoneCols.nonEmpty, "at least one zone column")
    val files = filesAt(spark, dir, v)
    if (files.isEmpty) return
    // all-null zone column in a file: ZoneMaps.compute leaves the file
    // out of that column's block — prunedFiles treats stat-less files
    // as unskippable, the only safe reading of "no stats"
    val json = ZoneMaps.blocksJson(zoneCols,
      ZoneMaps.compute(spark, dir, files, zoneCols))
    val f = fs(spark, dir)
    val tmp = new Path(logPath(dir), s".v$v.zones.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, new Path(logPath(dir), f"v$v%08d.zones.json")))
      throw new IllegalStateException(s"zone-map publish for v$v failed")
  }

  /** Single-column zone map (the common case). */
  def writeZoneMap(spark: SparkSession, dir: String, v: Long, zoneCol: String): Unit =
    writeZoneMaps(spark, dir, v, Seq(zoneCol))

  /** Range scan using the zone map: only files whose [lo, hi] intersects
    * [lo, hi] are read (the residual predicate still applies — zones
    * prune files, they don't filter rows). Falls back to the full file
    * set when no zone map exists for the version.
    */
  def readWhere(
      spark: SparkSession, dir: String, v: Long,
      zoneCol: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val pruned = prunedFiles(spark, dir, v, zoneCol, lo, hi)
    val df =
      if (pruned.isEmpty) readAt(spark, dir, v).limit(0)
      else spark.read.parquet(pruned.map(f => s"$dir/$f"): _*)
    df.filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
  }

  /** The file subset a zoned range scan of `[lo, hi]` would read. */
  def prunedFiles(
      spark: SparkSession, dir: String, v: Long,
      zoneCol: String, lo: Long, hi: Long): Seq[String] = {
    val f = fs(spark, dir)
    val zp = new Path(logPath(dir), f"v$v%08d.zones.json")
    val all = filesAt(spark, dir, v)
    if (!f.exists(zp)) return all
    val json = readFully(spark, dir, zp)
    ZoneMaps.parseBlock(json, zoneCol) match {
      case Some(zones) => ZoneMaps.prune(all, zones, lo, hi)
      case None => all // zoned on other columns only
    }
  }

  /** Row-level change feed between two snapshots (Delta CDF analog,
    * multiset semantics): rows in `to` but not `from` surface as
    * `insert`, rows gone as `delete`; an update is a delete+insert
    * pair. `exceptAll` keeps duplicate multiplicity so an append of an
    * identical row still shows as one insert. Cost: one anti-style
    * shuffle over both snapshots' changed columns — at scale, pair it
    * with partition pruning on the snapshots' shared layout; unchanged
    * files hash-match and cancel entirely.
    */
  def changes(spark: SparkSession, dir: String, from: Long, to: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val before = readAt(spark, dir, from)
    val after = readAt(spark, dir, to)
    after.exceptAll(before).withColumn("_change_type", lit("insert"))
      .unionByName(
        before.exceptAll(after).withColumn("_change_type", lit("delete")))
  }

  /** Delete data files referenced ONLY by versions older than the
    * newest `keepVersions`, and their log entries — plus any data
    * directory no retained snapshot references at all (failed-commit
    * debris). Time travel contracts to the retained window.
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must retain at least the current version")
    val f = fs(spark, dir)
    val all = versions(spark, dir)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepVersions))
    val live = keep.flatMap(filesAt(spark, dir, _)).toSet
    // sweep whole data dirs with no live files; else per-file
    val liveDirs = live.map(_.split("/", 2)(0))
    f.listStatus(new Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .foreach { st =>
        val d = st.getPath.getName
        if (!liveDirs.contains(d)) f.delete(st.getPath, true)
        else f.listStatus(st.getPath).toSeq.foreach { fileSt =>
          val rel = s"$d/${fileSt.getPath.getName}"
          if (fileSt.getPath.getName.endsWith(".parquet") && !live.contains(rel))
            f.delete(fileSt.getPath, false)
        }
      }
    drop.foreach { v =>
      f.delete(versionFile(dir, v), false)
      f.delete(new Path(logPath(dir), f"v$v%08d.zones.json"), false)
    }
  }
}
