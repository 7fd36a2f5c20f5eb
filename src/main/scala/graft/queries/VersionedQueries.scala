package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextDedup
import graft.ops.{Dedup, Upsert}
import graft.pipeline.IncrementalAgg
import graft.table.Versioned

/** Declared queries that run the VERSIONED TABLE layer itself under the
  * DuckDB oracle gate — the log-backed engine (append → MoR delete →
  * MERGE → snapshot read) executed for real against a throwaway table,
  * with the final snapshot hash-matched against a one-shot relational
  * replay of the same mutations. This is the lakehouse counterpart of
  * the `st*` streaming queries: not a batch twin of the semantics, but
  * the actual transactional machinery (commit log, deletion vectors,
  * matched-file rewrite) producing the checked rows.
  *
  * Reference analog: every silver upsert runs Delta MERGE under the
  * transaction log (`02_bronze_to_silver.py:67-87` and 12 more sites);
  * m5 is that exact shape — LWW MERGE into a multi-file ACID table that
  * has live deletion vectors.
  */
object VersionedQueries {
  import Tables.t

  private val tsUs = expr("ts div 1000")
  private val OracleTsUs = "CAST(epoch_ns(ts) // 1000 AS BIGINT)"

  /** Throwaway table root, swept at JVM exit — the consumer acts on
    * the returned (lazy) DataFrame after this function returns, so the
    * files must outlive the call but not the process. Shared with the
    * other self-contained engine queries (st8).
    */
  private[queries] def scratch(prefix: String): String = scratchDir(prefix)

  private def scratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val _ = new scala.reflect.io.Directory(d.toFile).deleteRecursively()
    }))
    d.toString
  }

  /** Latest-per-user halves of the events table split at the median
    * event_id: target = older half, source = newer half (m2's
    * derivation). Shared by m5 and m6 so the split and LWW tie-break
    * semantics — which both oracles replay — cannot silently drift
    * between the two queries. Both halves are materialized once
    * (localCheckpoint): each feeds multiple commit actions (append
    * writes, merge key-set broadcast, merge join), and without this
    * the full events scan + window re-executes per action.
    */
  private def splitLatestHalves(ev: DataFrame): (DataFrame, DataFrame) = {
    val evB = ev.crossJoin(broadcast(ev.agg(expr("count(1) div 2").as("__split"))))
    def latest(df: DataFrame) =
      Dedup.latestByKey(df, Seq("user_id"), Seq(col("ts_us").desc, col("event_id").desc))
    (latest(evB.filter(col("event_id") < col("__split")).drop("__split"))
       .localCheckpoint(),
     latest(evB.filter(col("event_id") >= col("__split")).drop("__split"))
       .localCheckpoint())
  }

  // M5 — MERGE INTO a versioned table. Data derivation mirrors m2
  // (older-half latest-per-user profile upserted with the newer half,
  // LWW on event time), but the target LIVES in the transaction log:
  //  - two appends split by user parity → multiple immutable file sets,
  //    so the merge's matched-file pruning is exercised for real;
  //  - a sparse MoR DELETE (user_id % 10 == 0) leaves live deletion
  //    vectors, so the merge must neither match nor resurrect
  //    soft-deleted rows — their keys re-enter as fresh inserts;
  //  - Versioned.merge commits through the log (schema enforced, DVs
  //    carried, commuting conflict rule) and the head snapshot is read
  //    back through the same log.
  def versionedMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    val (target, source) = splitLatestHalves(ev)
    val tableDir = scratchDir("graft_m5")
    Versioned.append(target.filter(col("user_id") % 2 === 0), tableDir)
    Versioned.append(target.filter(col("user_id") % 2 === 1), tableDir)
    Versioned.deleteWhereMoR(s, tableDir, col("user_id") % 10 === 0)
    Versioned.merge(s, tableDir, source, Seq("user_id"),
      updateWhen = Upsert.scol("ts_us") > Upsert.tcol("ts_us"))
    Versioned.read(s, tableDir)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  // The oracle replays the mutations relationally: the MoR delete is a
  // filter on the target (soft-deleted rows are invisible to the merge
  // and stay deleted), and the LWW merge is the same union +
  // row_number replay as m2's oracle — deleted-then-re-presented users
  // resolve to the source row, exactly what insert-after-soft-delete
  // must produce.
  val versionedMergeSql: String =
    s"""WITH n AS (SELECT count(*) AS c FROM events),
       |ev AS (SELECT user_id, event_id, event_type, value,
       |              $OracleTsUs AS ts_us FROM events),
       |tgt0 AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id < (SELECT c//2 FROM n)) WHERE rn = 1),
       |tgt AS (SELECT * FROM tgt0 WHERE user_id % 10 <> 0),
       |src AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id >= (SELECT c//2 FROM n)) WHERE rn = 1),
       |u AS (SELECT user_id, event_id, event_type, value, ts_us, 1 AS pri FROM tgt
       |      UNION ALL
       |      SELECT user_id, event_id, event_type, value, ts_us, 0 AS pri FROM src)
       |SELECT user_id, event_id, event_type, value FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts_us DESC, pri DESC) AS rn FROM u) WHERE rn = 1
       |ORDER BY user_id""".stripMargin

  // M6 — incrementally-maintained gold over a versioned silver's change
  // feed. Silver mutates exactly like m5 (two parity appends, a sparse
  // MoR delete, an LWW MERGE); gold = groupBy(event_type).agg(n,
  // sum(value_c)) is refreshed TWICE through IncrementalAgg:
  //  - after the appends → the full-recompute bootstrap path,
  //  - after delete+merge → the O(changes) path, aggregating only
  //    Versioned.changes(2, 4) with ±1/±value signs and merging the
  //    per-key deltas into the (small) gold table.
  // The oracle recomputes gold from the final silver state relationally
  // — so a green row proves the incremental maintenance is bit-exact
  // against full recompute (value is pre-floored to integer cents;
  // float sums would accumulate reordering ulps, SURVEY §7.4). Gold
  // itself is a VERSIONED table (refresh commits are idempotent
  // overwrites watermarked by silver version), the reference's ACID
  // gold tier (`07_gold_metrics_revenue.py:54-65`).
  def incrementalGold(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("value_c", floor(col("value") * 100))
      .select("user_id", "event_id", "event_type", "value_c", "ts_us")
    val (target, source) = splitLatestHalves(ev)
    val silverDir = scratchDir("graft_m6_silver")
    val goldDir = scratchDir("graft_m6_gold")
    Versioned.append(target.filter(col("user_id") % 2 === 0), silverDir)
    Versioned.append(target.filter(col("user_id") % 2 === 1), silverDir)
    IncrementalAgg.refresh(s, silverDir, goldDir, Seq("event_type"), Seq("value_c"))
    Versioned.deleteWhereMoR(s, silverDir, col("user_id") % 10 === 0)
    Versioned.merge(s, silverDir, source, Seq("user_id"),
      updateWhen = Upsert.scol("ts_us") > Upsert.tcol("ts_us"))
    IncrementalAgg.refresh(s, silverDir, goldDir, Seq("event_type"), Seq("value_c"))
    Versioned.read(s, goldDir).orderBy("event_type")
  }

  // Final silver state = m5's relational replay (with integer-cents
  // value); gold = one GROUP BY over it — the full-recompute twin the
  // incremental path must equal.
  val incrementalGoldSql: String =
    s"""WITH n AS (SELECT count(*) AS c FROM events),
       |ev AS (SELECT user_id, event_id, event_type,
       |              CAST(floor(value * 100) AS BIGINT) AS value_c,
       |              $OracleTsUs AS ts_us FROM events),
       |tgt0 AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id < (SELECT c//2 FROM n)) WHERE rn = 1),
       |tgt AS (SELECT * FROM tgt0 WHERE user_id % 10 <> 0),
       |src AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_us DESC, event_id DESC) rn
       |        FROM ev WHERE event_id >= (SELECT c//2 FROM n)) WHERE rn = 1),
       |u AS (SELECT user_id, event_type, value_c, ts_us, 1 AS pri FROM tgt
       |      UNION ALL
       |      SELECT user_id, event_type, value_c, ts_us, 0 AS pri FROM src),
       |fin AS (SELECT event_type, value_c FROM (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts_us DESC, pri DESC) AS rn FROM u) WHERE rn = 1)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(value_c) AS BIGINT) AS sum_value_c
       |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin

  // M7 — clustering OPTIMIZE under the gate. Two event_id-parity
  // appends interleave user_id across every file (the post-ingest state
  // where zone maps prune nothing); optimizeClusterBy rewrites the
  // snapshot range-clustered on user_id and publishes the zone sidecar;
  // the checked rows then come through readWhere — the ZONE-PRUNED scan
  // path, so a green row proves the clustered layout + sidecar + pruned
  // read return exactly the rows a plain filter does. OptimizeSpec
  // (VersionedSpec) separately pins that the pruned file set is a
  // strict subset after optimize.
  def optimizeCluster(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    val tableDir = scratchDir("graft_m7")
    Versioned.append(ev.filter(col("event_id") % 2 === 0), tableDir)
    Versioned.append(ev.filter(col("event_id") % 2 === 1), tableDir)
    val v = Versioned.optimizeClusterBy(s, tableDir, Seq("user_id"), targetFiles = 8)
    Versioned.readWhere(s, tableDir, v, "user_id", 3L, 9L)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id", "event_id")
  }

  val optimizeClusterSql: String =
    """SELECT user_id, event_id, event_type, value FROM events
      |WHERE user_id BETWEEN 3 AND 9 ORDER BY user_id, event_id""".stripMargin

  // X — a curation operator composed over the versioned read path:
  // exact dedup runs against a log-resolved, DV-subtracted snapshot
  // (two parity appends + a sparse MoR delete), proving the extension
  // surface and the transactional surface compose — the dedup input is
  // what the LOG says is live, not what a directory listing finds.
  def dedupVersioned(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val tableDir = scratchDir("graft_xdv")
    Versioned.append(docs.filter(col("doc_id") % 2 === 0), tableDir)
    Versioned.append(docs.filter(col("doc_id") % 2 === 1), tableDir)
    Versioned.deleteWhereMoR(s, tableDir, col("doc_id") % 7 === 0)
    TextDedup.exact(Versioned.read(s, tableDir), "doc_id", "text")
      .select(col("keep_id"), col("n_copies"))
      .orderBy("keep_id")
  }

  val dedupVersionedSql: String =
    """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents WHERE doc_id % 7 <> 0
      |GROUP BY text ORDER BY keep_id""".stripMargin

  // M9 — the SAME engine composition as m5 (two appends → MoR delete →
  // LWW MERGE → snapshot read), but every commit publishes through the
  // object-store-shaped ConditionalPutLogStore: mutual exclusion by
  // conditional PUT alone, no hard links, no no-overwrite rename. A
  // green row is the oracle-gate statement of the LogStore claim — the
  // transactional result is bit-identical whichever publish primitive
  // the store provides, so the S3-class seam is real end to end, not
  // just spec-deep. (Queries run sequentially in Verify/Bench, so the
  // scoped store override cannot leak into a concurrent query.)
  def versionedMergeCondPut(s: SparkSession, dir: String): DataFrame =
    Versioned.withLogStore(new graft.table.ConditionalPutLogStore) {
      versionedMerge(s, dir)
    }

  // M10 — the SAME engine composition as m5 (two parity appends → MoR
  // delete → LWW MERGE → snapshot read), but the MERGE arrives as SQL
  // TEXT through `spark.sql` — the statement form of EP3
  // (`02_bronze_to_silver.py:67-87`) that Delta users type as
  // `MERGE INTO delta./path`. Spark's own parser produces the
  // MergeIntoTable plan; the extension's analyzer rule translates it
  // onto Versioned.merge, so a green row proves the SQL surface drives
  // the identical transactional machinery (matched-file pruning, DV
  // awareness, LWW condition) — bit-for-bit against m5's oracle.
  def versionedMergeSqlText(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", tsUs)
      .select("user_id", "event_id", "event_type", "value", "ts_us")
    val (target, source) = splitLatestHalves(ev)
    val tableDir = scratchDir("graft_m10")
    Versioned.append(target.filter(col("user_id") % 2 === 0), tableDir)
    Versioned.append(target.filter(col("user_id") % 2 === 1), tableDir)
    Versioned.deleteWhereMoR(s, tableDir, col("user_id") % 10 === 0)
    source.createOrReplaceTempView("graft_m10_source")
    s.sql(
      s"""MERGE INTO `graft-versioned`.`$tableDir` t
         |USING graft_m10_source s
         |ON t.user_id = s.user_id
         |WHEN MATCHED AND s.ts_us > t.ts_us THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    Versioned.read(s, tableDir)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  // X — pure-SQL time travel: the events halves land as two APPEND
  // commits (v1 ⊂ v2), then BOTH snapshots are read back through
  // `spark.sql` alone — the `graft-versioned`.`/dir` relation with
  // `VERSION AS OF`, no graft imports on the read side (Delta's
  // `delta.`/path`` + time-travel SQL shape, `02:394-398`). The join of
  // the two per-type aggregates certifies that v1 still reads the OLD
  // file set after v2 committed — the core time-travel contract.
  def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("value_c", floor(col("value") * 100))
      .select("event_id", "event_type", "value_c")
    val evB = ev.crossJoin(broadcast(ev.agg(expr("count(1) div 2").as("__split"))))
    val tableDir = scratchDir("graft_sqltt")
    Versioned.append(evB.filter(col("event_id") < col("__split")).drop("__split"),
      tableDir) // v1: older half
    Versioned.append(evB.filter(col("event_id") >= col("__split")).drop("__split"),
      tableDir) // v2: + newer half (append-only, so v2 ⊃ v1)
    s.sql(
      s"""SELECT v1.event_type AS event_type,
         |       v1.n AS n_v1, v2.n AS n_v2,
         |       v1.sum_c AS sum_v1_c, v2.sum_c AS sum_v2_c
         |FROM (SELECT event_type, count(*) AS n,
         |             CAST(sum(value_c) AS BIGINT) AS sum_c
         |      FROM `graft-versioned`.`$tableDir` VERSION AS OF 1
         |      GROUP BY event_type) v1
         |JOIN (SELECT event_type, count(*) AS n,
         |             CAST(sum(value_c) AS BIGINT) AS sum_c
         |      FROM `graft-versioned`.`$tableDir` VERSION AS OF 2
         |      GROUP BY event_type) v2
         |  USING (event_type)
         |ORDER BY event_type""".stripMargin)
  }

  val sqlTimeTravelSql: String =
    """WITH n AS (SELECT count(*) AS c FROM events),
      |ev AS (SELECT event_id, event_type,
      |              CAST(floor(value * 100) AS BIGINT) AS value_c FROM events),
      |v1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(value_c) AS BIGINT) AS sum_c
      |       FROM ev WHERE event_id < (SELECT c//2 FROM n) GROUP BY event_type),
      |v2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(value_c) AS BIGINT) AS sum_c
      |       FROM ev GROUP BY event_type)
      |SELECT v1.event_type AS event_type, v1.n AS n_v1, v2.n AS n_v2,
      |       v1.sum_c AS sum_v1_c, v2.sum_c AS sum_v2_c
      |FROM v1 JOIN v2 USING (event_type) ORDER BY event_type""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("x_sql_timetravel", sqlTimeTravel, Some(sqlTimeTravelSql)),
    QueryDef("m5_versioned_merge", versionedMerge, Some(versionedMergeSql)),
    QueryDef("m9_condput_merge", versionedMergeCondPut, Some(versionedMergeSql)),
    QueryDef("m10_sql_merge", versionedMergeSqlText, Some(versionedMergeSql)),
    QueryDef("m6_incremental_gold", incrementalGold, Some(incrementalGoldSql)),
    QueryDef("m7_optimize_cluster", optimizeCluster, Some(optimizeClusterSql)),
    QueryDef("x_dedup_versioned", dedupVersioned, Some(dedupVersionedSql)))
}
