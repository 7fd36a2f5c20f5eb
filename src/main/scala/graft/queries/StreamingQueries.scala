package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared queries that run the STREAMING engine itself under the
  * DuckDB oracle gate — not batch twins of streaming fragments (w2–w6
  * already check those semantics), but actual `readStream` →
  * `writeStream` executions whose drained output must hash-match the
  * batch SQL answer. This is the strongest correctness statement the
  * harness can make about Structured Streaming: the incremental engine,
  * run for real with checkpoints and triggers, produces bit-identical
  * results to the one-shot relational definition.
  *
  * Determinism contract: results must not depend on how the file source
  * splits input into micro-batches.
  *  - st1 uses COMPLETE output mode with no watermark, so aggregation
  *    state is never evicted and no input row is ever dropped as late —
  *    the final table equals the batch GROUP BY under any batch split.
  *  - st2 is a stateless stream–static join in APPEND mode: every input
  *    row contributes exactly one output row set independent of
  *    batching.
  *  - st3 projects to the dedup key BEFORE dropDuplicates, so
  *    first-arrival nondeterminism cannot reach the output set.
  *  - st4 is an unwatermarked stream–stream inner join: no state is
  *    ever evicted, so the emitted pair SET equals the batch join.
  * Reference analog: the 9-notebook pipeline runs exactly this pattern
  * (stream in, relational transform, sink out) and trusts Delta to keep
  * the streaming answer consistent with batch reads
  * (`01_bronze_csv_to_delta.py:33-68`).
  */
object StreamingQueries {
  import Tables.t

  /** Drains `out` through a fresh AvailableNow memory-sink query named
    * `name` and returns the sink table. The checkpoint is a throwaway
    * temp dir: these are verification queries, re-planned from scratch
    * per run — durable checkpoints belong to the ingestion layer
    * (graft.streaming.Ingest), not the oracle surface.
    */
  private def drainToTable(
      s: SparkSession, out: DataFrame, name: String, mode: String): DataFrame = {
    s.catalog.dropTempView(name) // stale sink table from a prior run in this session
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft-$name-ckpt").toString
    // Stateful operators create one state-store instance PER shuffle
    // partition, and each instance writes checkpoint files every
    // micro-batch — at the verification data scale the per-partition
    // state overhead dominates, so the drain runs with a smaller
    // partition count (fixed at first checkpoint creation; results are
    // partition-count-independent by the determinism contract). The
    // session value is restored for the batch queries afterwards.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    // All stateful drains run on the RocksDB state store provider —
    // the 100 TB configuration. The default HDFSBackedStateStoreProvider
    // keeps every key's state ON HEAP per partition; a watermarked
    // stream-stream join (st4/st6) or unbounded dedup (st3) at 100 TB
    // event volume outgrows executor heap, while RocksDB spills to
    // local disk with a bounded block cache. Running the ORACLE gate
    // under RocksDB means every green st* row certifies the provider a
    // real deployment would use (provider is latched per-query at first
    // checkpoint creation, so setting it here scopes it to the drain).
    val prevProvider = s.conf.get(ProviderConf, "")
    s.conf.set(ProviderConf, RocksDbProvider)
    // Changelog checkpointing: upload per-batch CHANGES to the
    // checkpoint instead of a full RocksDB snapshot — at 100 TB state
    // the full-snapshot upload per batch dominates commit latency and
    // scales with STATE size, while the changelog scales with the
    // BATCH. StreamingStateSpec pins restart-from-checkpoint under it.
    val prevChangelog = s.conf.get(ChangelogConf, "")
    s.conf.set(ChangelogConf, "true")
    try {
      val q = out.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (prevProvider.isEmpty) s.conf.unset(ProviderConf)
      else s.conf.set(ProviderConf, prevProvider)
      if (prevChangelog.isEmpty) s.conf.unset(ChangelogConf)
      else s.conf.set(ChangelogConf, prevChangelog)
    }
    s.table(name)
  }

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Streaming source over the events table with the same epoch-micros
    * event-time derivation as the batch queries (Temporal.tsUs). The
    * batch read first pins the schema — streaming file sources cannot
    * infer — and sets the nanos-as-long conf legacy nanos files need.
    * The schema pinned on the stream is the RAW file schema (a
    * timestamp-typed `ts` must reach the parquet reader as such);
    * `Tables.normalizeEventTs` then restores the engine-wide
    * epoch-nanos-BIGINT `ts` contract on the streaming frame.
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet").schema
    // glob, not the literal file: for a non-glob path the file source
    // force-sets basePath to the path itself, and a single-FILE
    // basePath fails planning ("must be a directory"); a glob leaves
    // partition discovery anchored at the parent directory
    Tables.normalizeEventTs(
      s.readStream.schema(raw).parquet(s"$dir/events.parque[t]"))
  }

  // ST1 — the streaming engine's windowed aggregation end to end:
  // streaming parquet scan → the SAME shared tumbling-agg fragment the
  // batch w2 query uses (graft.streaming.Windows.tumblingTypeAgg) →
  // complete-mode memory sink drained by Trigger.AvailableNow. The
  // oracle is w2's SQL verbatim: streaming must equal batch.
  def streamAgg(s: SparkSession, dir: String): DataFrame = {
    val src = eventsStream(s, dir)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
    val agg = graft.streaming.Windows.tumblingTypeAgg(src, "ts_ts")
    drainToTable(s, agg, "graft_st1_sink", "complete")
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("window_start", "event_type")
  }

  val streamAggSql: String = Temporal.windowedAggSql

  // ST2 — stream–static join (the lakehouse enrichment shape: a live
  // event stream joined to a slowly-changing dimension read as a plain
  // batch table): purchases joined to the customer dim with an explicit
  // broadcast — the static side ships once per executor, the stream
  // side never shuffles. Stateless, append mode, deterministic under
  // any batch split.
  def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val src = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val joined = src
      .join(broadcast(dim), src("user_id") === dim("c_custkey"))
      .select("event_id", "user_id", "cents", "c_mktsegment")
    drainToTable(s, joined, "graft_st2_sink", "append")
      .orderBy("event_id")
  }

  val streamStaticJoinSql: String =
    """SELECT event_id, user_id,
      |       CAST(round(value*100) AS BIGINT) AS cents, c_mktsegment
      |FROM events JOIN customer ON user_id = c_custkey
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  // ST3 — streaming stateful deduplication (`dropDuplicates` over an
  // unbounded key state store, the streaming half of W1's batch dedup).
  // Batch-split independence demands care: dropDuplicates keeps the
  // FIRST arrival per key, and which physical row that is depends on
  // how the source batches — so the query projects down to the key
  // columns BEFORE deduplicating, making every duplicate row identical
  // and the output the exact distinct key set under any arrival order.
  // No watermark → state is never evicted → no row is ever wrongly
  // re-admitted. Oracle: SELECT DISTINCT.
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val keys = eventsStream(s, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    drainToTable(s, keys, "graft_st3_sink", "append")
      .orderBy("user_id", "event_type")
  }

  val streamDedupSql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // ST4 — stream–stream inner equi-join: each user's purchases joined
  // to the SAME stream's views (a self-join of two filtered
  // branches — the attribution shape). With no watermark both sides'
  // state is retained forever, so every cross-batch pairing is found
  // exactly once and the append-mode output SET equals the batch inner
  // join under any batch split; only arrival ORDER varies, which the
  // declared total sort erases. The join is an equi-join on user_id →
  // one hash exchange per side, state-store lookups thereafter — the
  // 100 TB-safe shape (a time-interval condition would additionally
  // bound state; here the verification table is finite by design).
  def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(s, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"))
    val joined = buys.join(views, col("user_id") === col("v_user"))
      .select("user_id", "buy_id", "view_id")
    drainToTable(s, joined, "graft_st4_sink", "append")
      .orderBy("user_id", "buy_id", "view_id")
  }

  val streamStreamJoinSql: String =
    """SELECT b.user_id, b.event_id AS buy_id, v.event_id AS view_id
      |FROM events b JOIN events v ON b.user_id = v.user_id
      |WHERE b.event_type = 'purchase' AND v.event_type = 'view'
      |ORDER BY b.user_id, buy_id, view_id""".stripMargin

  // ST5 — watermarked tumbling aggregation in APPEND mode: the
  // watermark-eviction half of the streaming engine st1's complete
  // mode never exercises. Append mode emits a window only once the
  // watermark (max event time − 1 h) passes its end, so the drained
  // output is exactly the FINALIZED windows — the trailing window(s)
  // above the final watermark are withheld, and the oracle replays
  // that rule relationally (HAVING window_end ≤ max(ts) − delay).
  // Determinism: the single-file source yields one data batch (no row
  // is ever late), and AvailableNow runs the no-data finalization
  // batch before terminating, so emission depends only on the data's
  // own max event time.
  def streamWatermarkAgg(s: SparkSession, dir: String): DataFrame = {
    val src = eventsStream(s, dir)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_ts", "1 hour")
    val agg = src
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
    drainToTable(s, agg, "graft_st5_sink", "append")
      .orderBy("window_start", "event_type")
  }

  val streamWatermarkAggSql: String =
    """WITH e AS (SELECT CAST(epoch_ns(ts)//1000 AS BIGINT) AS us, event_type
      |           FROM events),
      |m AS (SELECT (max(us)//1000)*1000 AS mx FROM e),
      |w AS (SELECT us - us % 3600000000 AS ws, event_type FROM e)
      |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, CAST(count(*) AS BIGINT) AS n
      |FROM w, m
      |GROUP BY ws, event_type, mx
      |HAVING ws + 3600000000 <= mx - 3600000000
      |ORDER BY window_start, event_type""".stripMargin

  // ST6 — WATERMARKED left-outer interval stream–stream join: the
  // state-EVICTION half of stream joins that st4's unwatermarked inner
  // form never exercises (graft.streaming.StreamJoins.intervalJoin is
  // the operator shape). Each purchase left-joins the same stream's
  // views within [0, 30 min] after it, both sides watermarked 1 h.
  // Determinism under AvailableNow mirrors st5: the single-file source
  // yields ONE data batch (watermark still 0 → every in-interval pair
  // matches, none is late), then the no-data finalization batch
  // advances the watermark to max(event time, ms floor) − 1 h and
  // EVICTS left state — unmatched purchases whose match window
  // [b_ts, b_ts + 30 min] is fully below the final watermark emit
  // exactly one null-padded row; unmatched purchases above it are
  // withheld in state forever. The oracle replays that rule
  // relationally: batch interval join for the matched set, NOT EXISTS
  // + the watermark bound for the null set.
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(s, dir)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_ts", "1 hour")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"), col("ts_ts").as("b_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts_ts").as("v_ts"))
    val joined = buys.join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("b_ts") &&
          col("v_ts") <= col("b_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select("user_id", "buy_id", "view_id")
    drainToTable(s, joined, "graft_st6_sink", "append")
      .orderBy("user_id", "buy_id", "view_id")
  }

  val streamIntervalJoinSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |                  CAST(epoch_ns(ts)//1000 AS BIGINT) AS us FROM events),
      |m AS (SELECT (max(us)//1000)*1000 - 3600000000 AS wm FROM e),
      |b AS (SELECT user_id, event_id AS buy_id, us AS b_us FROM e
      |      WHERE event_type = 'purchase'),
      |v AS (SELECT user_id AS v_user, event_id AS view_id, us AS v_us FROM e
      |      WHERE event_type = 'view'),
      |matched AS (SELECT b.user_id, b.buy_id, v.view_id
      |            FROM b JOIN v ON b.user_id = v.v_user
      |              AND v.v_us >= b.b_us AND v.v_us <= b.b_us + 1800000000),
      |unmatched AS (SELECT b.user_id, b.buy_id, CAST(NULL AS BIGINT) AS view_id
      |              FROM b, m
      |              WHERE NOT EXISTS (SELECT 1 FROM v
      |                  WHERE v.v_user = b.user_id
      |                    AND v.v_us >= b.b_us AND v.v_us <= b.b_us + 1800000000)
      |                AND b.b_us + 1800000000 < m.wm)
      |SELECT user_id, buy_id, view_id FROM matched
      |UNION ALL SELECT user_id, buy_id, view_id FROM unmatched
      |ORDER BY user_id, buy_id, view_id NULLS FIRST""".stripMargin

  // ST7 — CUSTOM stateful operator under the gate: gap sessionization
  // via flatMapGroupsWithState with EventTimeTimeout
  // (graft.operators.Sessions.sessionizeStreamWithTimeout) — the one
  // streaming primitive st1–st6 don't reach (arbitrary user state).
  // Determinism under AvailableNow, same reasoning as st5/st6: the
  // single data batch folds every user's full event set at once
  // (sorted inside the fold), emitting every session CLOSED by a
  // successor; the finalization batch advances the watermark to
  // max event time (ms floor, 0 s lateness) and fires EventTimeTimeout
  // for open sessions whose idle deadline (end + gap, ms floor, + 1)
  // has passed — those flush; later-deadline sessions stay in state,
  // withheld. The oracle replays exactly that split on w3's relational
  // session definition: every non-last session per user, plus the last
  // session where the timeout deadline precedes the final watermark.
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val src = eventsStream(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
    val sessions = graft.operators.Sessions
      .sessionizeStreamWithTimeout(src, Temporal.GapUs)
    drainToTable(s, sessions.toDF(), "graft_st7_sink", "append")
      .orderBy("user_id", "start_us")
  }

  val streamSessionizeSql: String =
    s"""WITH ${Temporal.sessionNumberedCte},
       |sess AS (SELECT user_id, session_seq,
       |           min(ts_us) AS start_us, max(ts_us) AS end_us,
       |           CAST(count(*) AS BIGINT) AS n_events
       |         FROM numbered GROUP BY 1, 2),
       |m AS (SELECT max(ts_us)//1000 AS wm_ms FROM ev),
       |last AS (SELECT user_id, max(session_seq) AS last_seq FROM sess GROUP BY 1)
       |SELECT s.user_id, s.start_us, s.end_us, s.n_events
       |FROM sess s JOIN last l ON s.user_id = l.user_id, m
       |WHERE s.session_seq < l.last_seq
       |   OR (s.end_us + ${Temporal.GapUs})//1000 + 1 < m.wm_ms
       |ORDER BY s.user_id, start_us""".stripMargin

  // ST8 — the LOG-DRIVEN streaming source AND sink over versioned
  // tables (format("graft-versioned") on both ends, the reference's
  // readStream-on-Delta → writeStream-to-Delta shape at 02:20-101):
  // the streaming capabilities whose engine side is the transaction
  // log itself. The query builds an upstream versioned table from
  // events in two append commits, PUMPS it through the source into a
  // DOWNSTREAM versioned table via the sink (AvailableNow,
  // checkpointed — each micro-batch one idempotent append commit in
  // the downstream log), then lands a maintenance compaction plus a
  // third append upstream and pumps AGAIN with the SAME checkpoint — a
  // restart mid-log. A green row therefore proves, under the oracle
  // gate: offsets-as-versions survive restart (the second pump moves
  // only the new window), optimize commits emit nothing, the sink's
  // (appId, batchId) watermarks never double-apply, and the
  // accumulated downstream table equals the batch read — the whole
  // versioned-to-versioned streaming pipeline exactly-once end to end.
  def streamVersioned(s: SparkSession, dir: String): DataFrame = {
    import graft.table.Versioned
    val ev = t(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .select("event_id", "user_id", "event_type", "ts_us")
    val upDir = VersionedQueries.scratch("graft_st8_up")
    val ckpt = VersionedQueries.scratch("graft_st8_ckpt")
    val downDir = VersionedQueries.scratch("graft_st8_down") + "/table"
    def pumpOnce(): Unit = {
      val q = graft.streaming.Ingest.versionedStream(s, upDir)
        .writeStream.format("graft-versioned")
        .option("path", downDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Versioned.append(ev.filter(col("event_id") % 3 === 0), upDir) // v1
    Versioned.append(ev.filter(col("event_id") % 3 === 1), upDir) // v2
    pumpOnce()
    Versioned.compact(s, upDir) // v3: row-preserving, must emit nothing
    Versioned.append(ev.filter(col("event_id") % 3 === 2), upDir) // v4
    pumpOnce() // restart: only the (v2, v4] window moves downstream
    Versioned.read(s, downDir).orderBy("event_id")
  }

  val streamVersionedSql: String =
    """SELECT event_id, user_id, event_type,
      |       CAST(epoch_ns(ts)//1000 AS BIGINT) AS ts_us
      |FROM events ORDER BY event_id""".stripMargin

  // ST9 — the streaming CHANGE FEED source (readChangeFeed=true, the
  // Delta CDF-streaming analog): where st8's insert-only tail STOPS on
  // a row-mutating commit, the change feed REPRESENTS it. The upstream
  // versioned table takes two parity appends, is pumped once (initial
  // snapshot → all rows as `insert`), then a row-level UPDATE commits
  // (copy-on-write rewrite — exactly what an insert-only stream cannot
  // carry) plus a third append, and the SAME checkpoint pumps again:
  // the second window's diff must emit the update as a delete+insert
  // PAIR plus the appended rows, and nothing else — carried rows in the
  // rewritten files cancel in the O(changed files) snapshot diff. Both
  // pumps land in a downstream versioned table through the idempotent
  // sink, so the green row also proves CDF rows compose with the
  // exactly-once sink under restart.
  def streamChangeFeed(s: SparkSession, dir: String): DataFrame = {
    import graft.table.Versioned
    val ev = t(s, dir, "events")
      .withColumn("value_c", floor(col("value") * 100))
      .select("event_id", "user_id", "event_type", "value_c")
    val upDir = VersionedQueries.scratch("graft_st9_up")
    val ckpt = VersionedQueries.scratch("graft_st9_ckpt")
    val downDir = VersionedQueries.scratch("graft_st9_down") + "/table"
    def pumpOnce(): Unit = {
      val q = graft.streaming.Ingest.versionedChangeFeed(s, upDir)
        .writeStream.format("graft-versioned")
        .option("path", downDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Versioned.append(ev.filter(col("event_id") % 2 === 0), upDir) // v1
    Versioned.append(ev.filter(col("event_id") % 2 === 1), upDir) // v2
    pumpOnce() // initial snapshot: every row as `insert`
    Versioned.updateWhere(s, upDir, col("event_id") % 5 === 0,
      Map("value_c" -> (col("value_c") + 1000))) // v3: row-mutating rewrite
    Versioned.append(
      ev.withColumn("event_id", col("event_id") + 10000000L), upDir) // v4
    pumpOnce() // restart: (v2, v4] diff = update pairs + new appends
    Versioned.read(s, downDir)
      .orderBy("event_id", "_change_type", "value_c")
  }

  // the v3 UPDATE's rows arrive as the PAIRED change types (the commit
  // recorded its non-SET columns as pairing keys), not delete+insert
  val streamChangeFeedSql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |                   CAST(floor(value * 100) AS BIGINT) AS value_c
      |            FROM events),
      |upd AS (SELECT * FROM ev WHERE event_id % 5 = 0)
      |SELECT event_id, user_id, event_type, value_c, _change_type FROM (
      |  SELECT event_id, user_id, event_type, value_c,
      |         'insert' AS _change_type FROM ev
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value_c,
      |         'update_preimage' FROM upd
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value_c + 1000,
      |         'update_postimage' FROM upd
      |  UNION ALL
      |  SELECT event_id + 10000000, user_id, event_type, value_c,
      |         'insert' FROM ev)
      |ORDER BY event_id, _change_type, value_c""".stripMargin

  // ST10 — INITIAL-SNAPSHOT ADMISSION CONTROL (maxFilesPerTrigger,
  // Delta's option): the default first batch of a versioned stream is
  // the FULL current snapshot — at 100 TB that is ~10⁶ files in one
  // micro-batch, an un-startable stream. The upstream table lands as
  // ONE version holding 8 data files; streamed with
  // maxFilesPerTrigger=3 the snapshot must arrive as exactly
  // ceil(8/3)=3 micro-batches (offsets `{"version":v,"index":i}` over
  // the snapshot's deterministic file order), each landed as its own
  // idempotent commit downstream; a post-drain append then flows as one
  // ordinary tail batch through the SAME checkpoint. The hashed output
  // carries the full content (exactly-once across the chunks) plus the
  // observed batch count — 3 snapshot chunks + 1 tail.
  def streamChunkedSnapshot(s: SparkSession, dir: String): DataFrame = {
    import graft.table.Versioned
    val ev = t(s, dir, "events")
      .filter(col("event_id") % 4 === 1)
      .withColumn("value_c", floor(col("value") * 100).cast("long"))
      .select("event_id", "user_id", "value_c")
    val upDir = VersionedQueries.scratch("graft_st10_up")
    val ckpt = VersionedQueries.scratch("graft_st10_ckpt")
    val downDir = VersionedQueries.scratch("graft_st10_down") + "/table"
    // ev holds event_id ≡ 1 (mod 4), i.e. ≡ 1 or 5 (mod 8) — the two
    // classes split the fixture into the snapshot and the tail commit
    Versioned.overwrite(ev.filter(col("event_id") % 8 === 1).repartition(8), upDir) // v1: 8 files
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    def pump(): Unit = {
      // default trigger, NOT AvailableNow: the available-now wrapper
      // latches one end offset, which by design bypasses per-trigger
      // admission (see the source's scaladoc)
      val q = s.readStream.format("graft-versioned")
        .option("path", upDir)
        .option("maxFilesPerTrigger", "3")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          if (!b.isEmpty) {
            batches.incrementAndGet()
            Versioned.appendIdempotent(b, downDir, "st10", batchId)
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination() }
    }
    pump() // snapshot: 3 chunks of ≤3 files
    Versioned.append(ev.filter(col("event_id") % 8 === 5), upDir) // v2
    pump() // tail: one batch for (v1, v2]
    val content = Versioned.read(s, downDir)
      .groupBy((col("user_id") % 16).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
      .withColumn("kind", lit("content"))
      .select("kind", "g", "n", "sum_c")
    val meta = s.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row("meta", -1L, batches.get(), 0L)),
      new org.apache.spark.sql.types.StructType()
        .add("kind", org.apache.spark.sql.types.StringType, false)
        .add("g", org.apache.spark.sql.types.LongType, false)
        .add("n", org.apache.spark.sql.types.LongType, false)
        .add("sum_c", org.apache.spark.sql.types.LongType, false))
    content.unionByName(meta).orderBy("kind", "g")
  }

  val streamChunkedSnapshotSql: String =
    """WITH ev AS (SELECT event_id, user_id,
      |                   CAST(floor(value * 100) AS BIGINT) AS value_c
      |            FROM events WHERE event_id % 4 = 1),
      |u AS (
      |  SELECT 'content' AS kind, user_id % 16 AS g,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(value_c) AS BIGINT) AS sum_c
      |  FROM ev GROUP BY user_id % 16
      |  UNION ALL
      |  SELECT 'meta', CAST(-1 AS BIGINT), CAST(4 AS BIGINT), CAST(0 AS BIGINT))
      |SELECT kind, g, n, sum_c FROM u ORDER BY kind, g""".stripMargin

  // ST11 — APPLY CHANGES end-to-end through a REAL checkpointed stream
  // (DLT's `apply_changes` fed by CDF, the streaming twin of
  // x_apply_changes' direct calls): the upstream versioned table takes
  // two time-ordered CDC appends; each is pumped through the SAME
  // checkpoint by [[graft.streaming.Ingest.applyChangesStream]] (change
  // feed → preimage filter → idempotent SCD2 apply), so the second
  // batch must close the first batch's open rows ACROSS the
  // stream-restart boundary exactly as one apply would, and a third
  // pump with no new upstream data must change nothing (replay
  // safety under AvailableNow restarts — the foreachBatch txn guard).
  // The hashed output is the full SCD2 history: per key, each change
  // holds [seq, lead(seq)).
  def streamApplyChanges(s: SparkSession, dir: String): DataFrame = {
    import graft.table.Versioned
    val ev = t(s, dir, "events")
      .filter(col("event_id") % 8 === 4)
      .select(col("user_id").as("uid"),
        floor(col("value") * 100).cast("long").as("val"),
        col("event_id").as("seq"))
    val upDir = VersionedQueries.scratch("graft_st11_up")
    val ckpt = VersionedQueries.scratch("graft_st11_ckpt")
    val tgt = VersionedQueries.scratch("graft_st11_tgt") + "/table"
    val mx = ev.agg(max(col("seq"))).head().getLong(0)
    def pump(): Unit = graft.streaming.Ingest.applyChangesStream(
      s, upDir, tgt, Seq("uid"), "seq", ckpt, scdType = 2, appId = "st11")
    Versioned.append(ev.filter(col("seq") <= mx / 2), upDir) // v1
    pump() // initial snapshot arrives as inserts → SCD2 opens
    Versioned.append(ev.filter(col("seq") > mx / 2), upDir)  // v2
    pump() // restart: the tail window closes cross-boundary rows
    pump() // no new data: must be a no-op through the same checkpoint
    Versioned.read(s, tgt)
      .select(col("uid"), col("val"), col("__START_AT").as("start_at"),
        coalesce(col("__END_AT"), lit(-1L)).as("end_at"))
      .orderBy("uid", "start_at")
  }

  val streamApplyChangesSql: String =
    """WITH ev AS (SELECT user_id AS uid,
      |                   CAST(floor(value * 100) AS BIGINT) AS val,
      |                   event_id AS seq
      |            FROM events WHERE event_id % 8 = 4),
      |seg AS (SELECT uid, val, seq AS start_at,
      |               lead(seq) OVER (PARTITION BY uid ORDER BY seq) AS end_at
      |        FROM ev)
      |SELECT uid, val, start_at, COALESCE(end_at, -1) AS end_at
      |FROM seg ORDER BY uid, start_at""".stripMargin

  // ST12 — ONLINE quality scoring: the batch-trained classifier
  // (x_quality_classifier's exact trainer, same constants) scores a
  // DOCUMENT STREAM with a stateless per-row token fold — append mode,
  // no state store, batching-independent by construction (integer adds,
  // one row in → one row out). The trained weight vector is
  // `PerceptronBuckets` rows — bounded by the bucket CONSTANT, not the
  // corpus (the k-means codebook-memo precedent for model-artifact-
  // scale collects) — pulled to the driver once and shipped into the
  // projection as a map literal, so the stream side needs no join at
  // all. At 100 TB this is the serving shape of every model-based
  // filter: train nightly in batch, score the ingest firehose online,
  // route on `pred` downstream. The gated row emits EVERY scored doc
  // (not just pred = +1): on this deliberately unlearnable fixture no
  // margin is positive, and a keep-only output would green-light the
  // gate on zero rows — scoring all rows keeps the hash check real.
  // Oracle: the classifier oracle's per-doc margins and predictions.
  def streamQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val wmap = graft.operators.LangModel
      .perceptronWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en",
        Extensions.PerceptronBuckets, Extensions.PerceptronRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(raw).parquet(s"$dir/documents.parque[t]")
    val toks = filter(
      split(trim(lower(col("text"))), "\\s+"),
      tk => length(tk) > 0)
    val scored = stream.select(
      col("doc_id"),
      aggregate(
        toks,
        lit(0L),
        (acc, tk) => acc + coalesce(
          element_at(typedlit(wmap),
            graft.functions.Text.polyHash(tk) % Extensions.PerceptronBuckets),
          lit(0L))).as("margin"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))
    drainToTable(s, scored, "graft_st12_sink", "append")
      .orderBy("doc_id")
  }

  val streamQualityFilterSql: String =
    s"""WITH base AS (${Extensions.qualityClassifierSql})
       |SELECT doc_id, margin, pred FROM base
       |ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("st1_stream_agg", streamAgg, Some(streamAggSql)),
    QueryDef("st2_stream_static_join", streamStaticJoin, Some(streamStaticJoinSql)),
    QueryDef("st3_stream_dedup", streamDedup, Some(streamDedupSql)),
    QueryDef("st4_stream_stream_join", streamStreamJoin, Some(streamStreamJoinSql)),
    QueryDef("st5_stream_watermark_agg", streamWatermarkAgg, Some(streamWatermarkAggSql)),
    QueryDef("st6_stream_interval_join", streamIntervalJoin, Some(streamIntervalJoinSql)),
    QueryDef("st7_stream_sessionize", streamSessionize, Some(streamSessionizeSql)),
    QueryDef("st8_stream_versioned", streamVersioned, Some(streamVersionedSql)),
    QueryDef("st9_stream_cdf", streamChangeFeed, Some(streamChangeFeedSql)),
    QueryDef("st10_stream_chunked", streamChunkedSnapshot, Some(streamChunkedSnapshotSql)),
    QueryDef("st11_stream_apply_changes", streamApplyChanges,
      Some(streamApplyChangesSql)),
    QueryDef("st12_stream_quality_filter", streamQualityFilter,
      Some(streamQualityFilterSql)))
}
