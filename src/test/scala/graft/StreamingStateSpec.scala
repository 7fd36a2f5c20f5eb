package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessions
import graft.operators.Sessions.{Ev, Session}
import graft.streaming.Windows

/** Streaming semantics beyond the reference (§2.9 extensions):
  * event-time windowed aggregation under a watermark, and custom
  * per-key state via flatMapGroupsWithState. Both are reconciled
  * against their batch twins — the same code paths the DuckDB-checked
  * w2/w3 queries run.
  */
class StreamingStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("watermarked tumbling windows emit closed windows that match the batch agg") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Windows.tumblingTypeAgg(
      in.toDF().toDF("ts_ts", "event_type", "value").withWatermark("ts_ts", "2 hours"),
      "ts_ts")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      val early = Seq(
        (ts(0, 10), "click", 1.50), (ts(0, 40), "click", 2.25),
        (ts(0, 55), "view", 0.75), (ts(1, 15), "click", 4.00))
      in.addData(early: _*)
      q.processAllAvailable()
      // watermark is still at hour 1 − 2h: nothing may be emitted yet
      assert(spark.table("win_out").isEmpty)

      // an hour-10 event pushes the watermark to hour 8: hours 0-1 close
      in.addData((ts(10), "view", 9.99))
      q.processAllAvailable()
      in.addData((ts(11), "view", 0.01)) // advance again to flush commit
      q.processAllAvailable()

      val emitted = spark.table("win_out")
        .select(date_format(col("window_start"), "HH").as("h"), col("event_type"),
          col("n"), col("value_cents"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin over the same closed-window events
      val batch = Windows.tumblingTypeAgg(
        early.toDF("ts_ts", "event_type", "value"), "ts_ts")
        .select(date_format(col("window_start"), "HH"), col("event_type"),
          col("n"), col("value_cents"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(emitted == batch)
      assert(emitted == Set(
        ("00", "click", 2L, 375L), ("00", "view", 1L, 75L), ("01", "click", 1L, 400L)))
    } finally q.stop()
  }

  test("event-time timeout flushes idle sessions once the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 6L * 3600 * 1000000
    // keep event times away from epoch 0 (the initial watermark value):
    // an event exactly AT the watermark is boundary-dropped as late
    val base = 1700000000L * 1000000
    def us(h: Int): Long = base + h * 3600L * 1000000
    val in = MemoryStream[Ev]
    val q = Sessions.sessionizeStreamWithTimeout(in.toDF(), gapUs)
      .writeStream.format("memory").queryName("sess_timeout_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(1, us(0), 100), Ev(1, us(1), 101))
      q.processAllAvailable()
      assert(spark.table("sess_timeout_out").isEmpty) // watermark at h1: session idle but not expired

      // another user's far-future event advances the watermark past
      // u1's lastUs + gap → u1's open session must flush via timeout
      in.addData(Ev(2, us(30), 200))
      q.processAllAvailable()
      in.addData(Ev(3, us(31), 300)) // trigger the post-watermark batch
      q.processAllAvailable()

      val emitted = spark.table("sess_timeout_out").as[Session].collect().toSet
      assert(emitted.contains(Session(1, us(0), us(1), 2)),
        s"idle session not flushed; emitted=$emitted")
    } finally q.stop()
  }

  test("admitted-late events fold like the batch twin: merge within gap, own session beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 2L * 3600 * 1000000 // 2h gap
    val base = 1700000000L * 1000000
    def us(h: Int): Long = base + h * 3600L * 1000000
    val in = MemoryStream[Ev]
    // 24h lateness: cross-batch disorder is deliberately admitted
    val q = Sessions.sessionizeStreamWithTimeout(in.toDF(), gapUs, maxLateness = "24 hours")
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode(OutputMode.Append).start()
    try {
      // open session [h10, h11]
      in.addData(Ev(1, us(10), 100), Ev(1, us(11), 101))
      q.processAllAvailable()
      // batch 2, both admitted (watermark = h11 - 24h):
      //   h9  — within gap of the open start → merges, lowering start
      //   h2  — >gap before the open session → must form its OWN session
      in.addData(Ev(1, us(9), 102), Ev(1, us(2), 103))
      q.processAllAvailable()

      val emitted = spark.table("sess_late_out").as[Session].collect().toSet
      assert(emitted == Set(Session(1, us(2), us(2), 1)),
        s"far-late event must close as its own session, got $emitted")

      // close the (now widened) open session with a far-future jump and
      // check it folded the near-late event into [h9, h11] with n=3
      in.addData(Ev(1, us(40), 104))
      q.processAllAvailable()
      val after = spark.table("sess_late_out").as[Session].collect().toSet
      assert(after.contains(Session(1, us(9), us(11), 3)),
        s"near-late event must merge into the open session, got $after")
    } finally q.stop()
  }

  test("RocksDB state store: provider is pinned and dedup state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.StreamingQueries.{ChangelogConf, ProviderConf, RocksDbProvider}
    val ckpt = tmpDir("graft-rocksdb-ckpt")
    val in = MemoryStream[(Long, String)]
    val prev = spark.conf.get(ProviderConf)
    spark.conf.set(ProviderConf, RocksDbProvider)
    // changelog checkpointing: per-batch CHANGES upload instead of a
    // full snapshot — the restart below must replay state from them
    spark.conf.set(ChangelogConf, "true")
    // the memory sink refuses checkpoint RECOVERY (not fault-tolerant);
    // foreachBatch into a concurrent buffer supports it — st10's shape
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    try {
      def startQuery() = in.toDF().toDF("user_id", "event_type")
        .dropDuplicates("user_id", "event_type")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => emitted.add((r.getLong(0), r.getString(1))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()

      val q1 = startQuery()
      try {
        in.addData((1L, "click"), (2L, "view"), (1L, "click"))
        q1.processAllAvailable()
        // pin the provider: the RocksDB store reports its own custom
        // metrics in the state-operator progress; the HDFS-backed
        // default reports none of these
        val metrics = q1.lastProgress.stateOperators.head.customMetrics
        assert(metrics.keySet().stream().anyMatch(_.startsWith("rocksdb")),
          s"state operator reports no rocksdb* metrics: ${metrics.keySet()}")
        assert(emitted.size == 2, s"expected 2 distinct keys, got $emitted")
        // changelog checkpointing must actually be in effect: the state
        // checkpoint carries .changelog files, not only full snapshots
        val changelogs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
          .filter(_.toString.endsWith(".changelog")).count()
        assert(changelogs > 0, "checkpoint carries no RocksDB changelog files")
      } finally q1.stop()

      // restart from the SAME checkpoint: the dedup key state must be
      // reloaded from the RocksDB files, so the replayed duplicate of a
      // pre-restart key stays suppressed and only the new key is emitted
      emitted.clear()
      val q2 = startQuery()
      try {
        in.addData((1L, "click"), (3L, "purchase"))
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        assert(emitted.asScala.toSet == Set((3L, "purchase")),
          s"pre-restart keys must stay suppressed after restart: $emitted")
      } finally q2.stop()
    } finally {
      spark.conf.set(ProviderConf, prev)
      spark.conf.unset(ChangelogConf)
    }
  }

  test("flatMapGroupsWithState sessionization matches the batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 6L * 3600 * 1000000
    def us(h: Int): Long = h * 3600L * 1000000
    val in = MemoryStream[Ev]
    val q = Sessions.sessionizeStream(in.toDS(), gapUs)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 two events 1h apart (one session), u2 one event
      in.addData(Ev(1, us(0), 100), Ev(1, us(1), 101), Ev(2, us(0), 200))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // nothing closed yet

      // batch 2: u1 jumps 20h (closes session 1); u2 stays in gap
      in.addData(Ev(1, us(21), 102), Ev(2, us(5), 201))
      q.processAllAvailable()
      val emitted = spark.table("sess_out").as[Session].collect().toSet
      assert(emitted == Set(Session(1, us(0), us(1), 2)))

      // reconcile with the batch twin: closed streaming sessions ==
      // batch sessions minus each user's trailing (still-open) session
      val allEvents = Seq(
        (1L, us(0), 100L), (1L, us(1), 101L), (2L, us(0), 200L),
        (1L, us(21), 102L), (2L, us(5), 201L)).toDF("user_id", "ts_us", "event_id")
      val batchSessions = Sessions.sessionizeBatch(allEvents, gapUs)
      val closedBatch = batchSessions
        .join(Sessions.lastSessionPerUser(batchSessions)
          .select("user_id", "session_seq"), Seq("user_id", "session_seq"), "left_anti")
        .select("user_id", "start_us", "end_us", "n_events")
        .as[Session].collect().toSet
      assert(closedBatch == emitted)
    } finally q.stop()
  }
}
