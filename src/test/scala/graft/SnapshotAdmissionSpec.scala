package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.{SnapshotSliceOffset, VersionedTableSource}

import graft.table.Versioned

/** Initial-snapshot admission control on the versioned streaming
  * source (`maxFilesPerTrigger`/`maxBytesPerTrigger`, Delta's options):
  * the default first batch is the FULL current snapshot — at 100 TB
  * that is ~10⁶ files in one micro-batch, an un-startable stream. With
  * admission set, the snapshot drains as index ranges over its
  * deterministic file order, offsets `{"version":v,"index":i}` (Delta's
  * `DeltaSourceOffset(reservoirVersion, index)` shape), pinned across
  * restarts by a marker under the source's checkpoint metadata dir —
  * NOT re-resolved from the (possibly moved) head.
  */
class SnapshotAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private def classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** A table whose head snapshot has exactly `nFiles` data files. */
  private def mkTable(prefix: String, nFiles: Int): String = {
    val dir = tmpDir(prefix)
    Versioned.overwrite(
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(nFiles), dir)
    assert(Versioned.filesAt(spark, dir, 1L).size == nFiles)
    dir
  }

  private def mkSource(
      dir: String, meta: String,
      maxFiles: Option[Long] = None, maxBytes: Option[Long] = None,
      changeFeed: Boolean = false): VersionedTableSource = {
    val base = Versioned.read(spark, dir).schema
    val sch = if (changeFeed)
      base.add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
    else base
    new VersionedTableSource(classic, dir, sch,
      startingVersion = None, skipChangeCommits = false,
      maxVersionsPerTrigger = None, changeFeed = changeFeed,
      maxFilesPerTrigger = maxFiles, maxBytesPerTrigger = maxBytes,
      metadataPath = Some(meta))
  }

  /** Row count of a slice via its deterministic batch twin (getBatch
    * frames are streaming-flagged by contract).
    */
  private def twin(dir: String, v: Long, i1: Long, i2: Long): Long =
    Versioned.readSnapshotSlice(spark, dir, v, i1, i2).count()

  test("maxFilesPerTrigger drains the initial snapshot as index-range chunks") {
    val dir = mkTable("adm_files", 5)
    val src = mkSource(dir, tmpDir("adm_files_meta"), maxFiles = Some(2L))
    // chunk offsets advance only as getBatch consumes them
    assert(src.getOffset.contains(SnapshotSliceOffset(1L, 2L)))
    assert(src.getOffset.contains(SnapshotSliceOffset(1L, 2L)), "re-offer until processed")
    assert(src.getBatch(None, SnapshotSliceOffset(1L, 2L)).isStreaming)
    assert(src.getOffset.contains(SnapshotSliceOffset(1L, 4L)))
    assert(src.getBatch(
      Some(SnapshotSliceOffset(1L, 2L)), SnapshotSliceOffset(1L, 4L)).isStreaming)
    assert(src.getOffset.contains(SnapshotSliceOffset(1L, 5L)))
    assert(src.getBatch(
      Some(SnapshotSliceOffset(1L, 4L)), SnapshotSliceOffset(1L, 5L)).isStreaming)
    // snapshot drained, no tail commits: idle
    assert(src.getOffset.isEmpty)
    // the slices cover the snapshot exactly (disjoint, same DV rules)
    assert(twin(dir, 1L, 0L, 2L) + twin(dir, 1L, 2L, 4L) + twin(dir, 1L, 4L, 5L)
      == Versioned.read(spark, dir).count())
    // a tail commit after the drain flows as a plain version offset
    Versioned.append(Seq((1000L, "x")).toDF("id", "s"), dir) // v2
    assert(src.getOffset.contains(LongOffset(2L)))
    assert(src.getBatch(
      Some(SnapshotSliceOffset(1L, 5L)), LongOffset(2L)).isStreaming)
    assert(Versioned.streamBatch(spark, dir, 1L, 2L).count() == 1)
  }

  test("restart mid-snapshot resumes from the marker, not the moved head") {
    val dir = mkTable("adm_restart", 5)
    val meta = tmpDir("adm_restart_meta")
    val src1 = mkSource(dir, meta, maxFiles = Some(2L))
    assert(src1.getOffset.contains(SnapshotSliceOffset(1L, 2L)))
    assert(src1.getBatch(None, SnapshotSliceOffset(1L, 2L)).isStreaming)
    // head moves between the crash and the restart
    Versioned.append(Seq((1000L, "x")).toDF("id", "s"), dir) // v2
    // a fresh source over the same checkpoint metadata keeps the pin:
    // the next offer continues version 1's file order — re-pinning at
    // the new head would mix two file orders in one stream
    val src2 = mkSource(dir, meta, maxFiles = Some(2L))
    assert(src2.getOffset.contains(SnapshotSliceOffset(1L, 4L)))
    assert(src2.getBatch(
      Some(SnapshotSliceOffset(1L, 2L)), SnapshotSliceOffset(1L, 4L)).isStreaming)
    assert(src2.getOffset.contains(SnapshotSliceOffset(1L, 5L)))
    assert(src2.getBatch(
      Some(SnapshotSliceOffset(1L, 4L)), SnapshotSliceOffset(1L, 5L)).isStreaming)
    // snapshot drained → the tail window (v1, v2] serves the append
    assert(src2.getOffset.contains(LongOffset(2L)))
  }

  test("a restart that dropped the admission options still emits every snapshot row") {
    val dir = mkTable("adm_drop", 4)
    val meta = tmpDir("adm_drop_meta")
    val src1 = mkSource(dir, meta, maxFiles = Some(2L))
    assert(src1.getOffset.contains(SnapshotSliceOffset(1L, 2L)))
    assert(src1.getBatch(None, SnapshotSliceOffset(1L, 2L)).isStreaming)
    Versioned.append(Seq((1000L, "x")).toDF("id", "s"), dir) // v2
    // restarted WITHOUT maxFilesPerTrigger: the engine replays from the
    // checkpointed slice offset straight to a version offset — the
    // crossing batch must carry the un-admitted remainder of the pinned
    // snapshot plus the tail window, exactly once
    val src2 = mkSource(dir, meta)
    val crossing = src2.getBatch(
      Some(SerializedOffset(SnapshotSliceOffset(1L, 2L).json)), LongOffset(2L))
    assert(crossing.isStreaming)
    val expected = twin(dir, 1L, 2L, 4L) + Versioned.streamBatch(spark, dir, 1L, 2L).count()
    assert(expected == twin(dir, 1L, 2L, 4L) + 1)
    // twin of the crossing frame: remaining slice ∪ tail
    assert(Versioned.readSnapshotSlice(spark, dir, 1L, 2L, 4L)
      .unionByName(Versioned.streamBatch(spark, dir, 1L, 2L))
      .count() == expected)
  }

  test("maxBytesPerTrigger is a soft cap that always admits at least one file") {
    val dir = mkTable("adm_bytes", 4)
    // 1 byte: every chunk is exactly one file (soft-max floor)
    val tiny = mkSource(dir, tmpDir("adm_bytes_meta1"), maxBytes = Some(1L))
    assert(tiny.getOffset.contains(SnapshotSliceOffset(1L, 1L)))
    assert(tiny.getBatch(None, SnapshotSliceOffset(1L, 1L)).isStreaming)
    assert(tiny.getOffset.contains(SnapshotSliceOffset(1L, 2L)))
    // huge budget: the whole snapshot in one chunk
    val big = mkSource(dir, tmpDir("adm_bytes_meta2"), maxBytes = Some(Long.MaxValue / 2))
    assert(big.getOffset.contains(SnapshotSliceOffset(1L, 4L)))
  }

  test("CDF mode tags admitted snapshot chunks as insert rows") {
    val dir = mkTable("adm_cdf", 3)
    val src = mkSource(dir, tmpDir("adm_cdf_meta"), maxFiles = Some(2L), changeFeed = true)
    assert(src.getOffset.contains(SnapshotSliceOffset(1L, 2L)))
    assert(src.getBatch(None, SnapshotSliceOffset(1L, 2L)).isStreaming)
    // batch twin: the slice under the insert tag
    import org.apache.spark.sql.functions.{col, lit}
    val t = Versioned.readSnapshotSlice(spark, dir, 1L, 0L, 2L)
      .withColumn("_change_type", lit("insert"))
    assert(t.filter(col("_change_type") === "insert").count() == t.count())
  }

  test("admission options are refused with startingVersion (no snapshot phase)") {
    val dir = mkTable("adm_reject", 2)
    val provider = new org.apache.spark.sql.graft.VersionedTableSourceProvider
    val e = intercept[IllegalArgumentException] {
      provider.createSource(spark.sqlContext, tmpDir("adm_reject_meta"), None,
        "graft-versioned",
        Map("path" -> dir, "startingVersion" -> "0", "maxFilesPerTrigger" -> "2"))
    }
    assert(e.getMessage.contains("maxVersionsPerTrigger"))
  }

  test("latestOffset caps every batch from the engine-provided start (no blind first)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = tmpDir("adm_latest")
    (1 to 5).foreach(i =>
      Versioned.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), dir)) // v1..v5
    val src = new org.apache.spark.sql.graft.VersionedTableSource(
      classic, dir, Versioned.read(spark, dir).schema,
      startingVersion = Some(0L), skipChangeCommits = false,
      maxVersionsPerTrigger = Some(2L))
    // the engine path hands the start offset — the first batch is
    // capped at start+m, where the legacy getOffset path must offer
    // the whole backlog blind
    assert(src.latestOffset(SerializedOffset("1"), ReadLimit.allAvailable())
      == LongOffset(3L))
    // fresh stream (null start): capped from the startingVersion floor
    val src2 = new org.apache.spark.sql.graft.VersionedTableSource(
      classic, dir, Versioned.read(spark, dir).schema,
      startingVersion = Some(0L), skipChangeCommits = false,
      maxVersionsPerTrigger = Some(2L))
    assert(src2.latestOffset(null, ReadLimit.allAvailable()) == LongOffset(2L))
  }

  test("a pre-admission checkpoint restarted WITH chunking options never re-opens the snapshot") {
    val dir = mkTable("adm_preexisting", 4)
    Versioned.append(Seq((1000L, "x")).toDF("id", "s"), dir) // v2
    // checkpoint holds a plain version offset (the pre-admission
    // format); the restarted source has maxFilesPerTrigger set — a
    // snapshot-phase offer here would re-emit every row
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val src = mkSource(dir, tmpDir("adm_preexisting_meta"), maxFiles = Some(2L))
    assert(src.latestOffset(SerializedOffset("1"), ReadLimit.allAvailable())
      == LongOffset(2L), "tail offer, not a snapshot slice")
  }

  test("Trigger.AvailableNow drains the snapshot in admission-sized chunks") {
    val dir = mkTable("adm_avnow", 6)
    val ckpt = tmpDir("adm_avnow_ckpt")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    val q = spark.readStream.format("graft-versioned")
      .option("path", dir)
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.as[(Long, String)].collect()
        if (rows.nonEmpty) { sizes += rows.length.toLong; got ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.toSet == (1L to 100L).map(i => (i, s"r$i")).toSet)
    assert(sizes.sum == 100L, "every snapshot row exactly once")
    assert(sizes.size >= 3,
      s"6 files at maxFilesPerTrigger=2 must drain as ≥3 chunked batches " +
        s"under AvailableNow (not the one-shot wrapper), got $sizes")
  }

  test("end-to-end: a chunked engine-driven stream lands the full snapshot exactly once") {
    val dir = mkTable("adm_e2e", 6)
    val ckpt = tmpDir("adm_e2e_ckpt")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    val q = spark.readStream.format("graft-versioned")
      .option("path", dir)
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.as[(Long, String)].collect()
        sizes += rows.length.toLong
        got ++= rows
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == (1L to 100L).map(i => (i, s"r$i")).toSet)
    assert(sizes.sum == 100L, "every snapshot row exactly once")
    assert(sizes.count(_ > 0) >= 3,
      s"6 files at maxFilesPerTrigger=2 must arrive in ≥3 non-empty batches, got $sizes")
  }
}
