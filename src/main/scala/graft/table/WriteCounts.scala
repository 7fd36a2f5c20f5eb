package graft.table

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Captures per-file row counts FROM THE WRITE JOB ITSELF, so the
  * row-stats sidecar ([[RowStats]]) costs a commit nothing beyond the
  * write it already ran: Spark's file-write tasks track
  * `outputMetrics.recordsWritten` (the same counter
  * `BasicWriteJobStatsTracker` feeds — Delta's `numRecords` comes from
  * exactly this), and a non-partitioned parquet write names each
  * task's file `part-<partitionId>%05d-…`, so (partition index →
  * records) keyed off TaskEnd events maps 1:1 onto the files the write
  * produced. Re-opening footers after the write — the round-13 shape —
  * paid a second GET per fresh file at object-store scale and ~1.5×
  * per commit locally; this reads the counts Spark already computed.
  *
  * Capture is BEST-EFFORT and every miss is safe: entries land in a
  * bounded cache that [[Versioned]]'s carry path consumes
  * ([[takeAll]]), and any file the cache cannot vouch for falls back
  * to the footer pass ([[RowStats.compute]]). Deliberately dropped as
  * unvouchable:
  *
  *  - a partition index that produced MULTIPLE files
  *    (`maxRecordsPerFile` splits — the index no longer identifies one
  *    file);
  *  - an index whose successful attempts disagree on the count
  *    (speculation/retry over a nondeterministic input — rather than
  *    guess which attempt's file survived commit, re-read the footer);
  *  - files whose name does not parse as `part-NNNNN` at all.
  *
  * Scoping: the listener tags the write action with a one-shot job
  * group and only trusts TaskEnds from stages of THAT group's jobs
  * that actually wrote bytes — AQE shuffle-materialization jobs under
  * the same action report zero `bytesWritten` and are ignored (their
  * partition indices would otherwise collide with the write stage's).
  */
private[graft] object WriteCounts {

  /** rel-path → physical rows, filled by [[capture]], drained by
    * [[takeAll]]. Rel paths embed a full-UUID directory — no
    * cross-write collisions. Bounded so abandoned writes (failed
    * commits never reach the carry) cannot grow it without limit;
    * overflow entries are simply not cached (footer fallback).
    */
  private val cache = new ConcurrentHashMap[String, java.lang.Long]()
  private val CacheMax = 1 << 17

  /** Runs `write` (which must perform exactly one file-writing action
    * on `df`'s session) under a scoped listener and returns the
    * captured (partition index → records) for write tasks. Public only
    * to its Versioned call site and specs.
    */
  def capture(df: DataFrame, write: => Unit): Map[Int, Long] = {
    val sc = df.sparkSession.sparkContext
    val group = s"graft-write-${UUID.randomUUID()}"
    val stages = ConcurrentHashMap.newKeySet[Int]()
    // boxed values: Scala unboxes CHM.put's null (absent) return of a
    // primitive Long to 0, which would fake a conflict on first insert
    val counts = new ConcurrentHashMap[Int, java.lang.Long]()
    val conflicted = ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (Option(js.properties).exists(p =>
            group == p.getProperty("spark.jobGroup.id")))
          js.stageIds.foreach(stages.add(_))
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (stages.contains(te.stageId) && te.taskMetrics != null &&
            te.taskMetrics.outputMetrics.bytesWritten > 0) {
          val idx = te.taskInfo.index
          val n = te.taskMetrics.outputMetrics.recordsWritten
          val prev = counts.put(idx, java.lang.Long.valueOf(n))
          if (prev != null && prev.longValue != n) conflicted.add(idx)
        }
    }
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    sc.addSparkListener(listener)
    try {
      sc.setLocalProperty("spark.jobGroup.id", group)
      write
      // the bus is async: drain it so this action's TaskEnds are in
      scala.util.Try(org.apache.spark.graft.CoreBridge.flushListeners(sc))
      import scala.jdk.CollectionConverters._
      counts.asScala.toMap.view
        .filterKeys(i => !conflicted.contains(i))
        .mapValues(_.longValue).toMap
    } finally {
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.removeSparkListener(listener)
    }
  }

  private val PartIdx = raw"part-(\d+)-.*".r

  /** Associates freshly-written rel paths with captured counts and
    * caches the unambiguous ones. A partition index claimed by two
    * files, or a file with no parseable index, is left uncached.
    */
  def record(relFiles: Seq[String], byIndex: Map[Int, Long]): Unit = {
    val indexed = relFiles.flatMap { rel =>
      rel.split('/').last match {
        case PartIdx(i) => Some(i.toInt -> rel)
        case _ => None
      }
    }
    val dup = indexed.groupBy(_._1).collect { case (i, fs) if fs.size > 1 => i }
      .toSet
    for ((i, rel) <- indexed if !dup(i); n <- byIndex.get(i))
      if (cache.size < CacheMax) cache.put(rel, n)
  }

  /** Removes and returns every cached count among `relFiles` — consume
    * semantics, a count is served to exactly one commit's sidecar.
    */
  def takeAll(relFiles: Seq[String]): Map[String, Long] =
    relFiles.flatMap(f => Option(cache.remove(f)).map(f -> _.longValue)).toMap

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
  private[graft] def cachedSize: Int = cache.size
}
