package graft

import org.apache.spark.sql.AnalysisException

import graft.table.Versioned

/** The named-table SQL surface: a [[org.apache.spark.sql.graft.GraftCatalog]]
  * registered as `spark.sql.catalog.<name>` must carry the full
  * lifecycle — CREATE NAMESPACE / CREATE TABLE / INSERT INTO / INSERT
  * OVERWRITE / SELECT with VERSION AS OF and TIMESTAMP AS OF / MERGE
  * INTO / ALTER TABLE RENAME / DROP — through the same transaction log
  * the Scala API writes (the identifier IS the warehouse path; no
  * metastore).
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  /** Fresh catalog per test: confs are read lazily, so registering on
    * the live shared session is enough.
    */
  private def freshCatalog(): (String, String) = {
    n += 1
    val cat = s"tcat$n"
    val wh = tmpDir(s"graftcat$n")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("create namespace + table, insert, select by name") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT id, s FROM $cat.db.t").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the catalog wrote through the ordinary log: Scala API sees it
    assert(Versioned.versions(spark, s"$wh/db/t") == Seq(1L, 2L, 3L))
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().map(_.getString(1)).toSeq
      == Seq("t"))
  }

  test("named time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2)")
    // v1 is the CREATE's schema-only snapshot (versions are 1-based)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 1")
      .as[Long].head == 0L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.t VERSION AS OF 2")
      .as[Long].head == 1L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.t VERSION AS OF 3")
      .as[Long].head == 3L)
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 9").collect())
  }

  test("INSERT OVERWRITE truncates through the V1 write bridge") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT id + 10, s FROM $cat.t VERSION AS OF 2")
    assert(spark.sql(s"SELECT id FROM $cat.t").as[Long].collect().toSet
      == Set(11L, 12L))
    // overwrite is a new snapshot, not history loss
    assert(spark.sql(s"SELECT id FROM $cat.t VERSION AS OF 2").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("MERGE INTO a catalog-named target") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 20)")
    Seq((2L, 99L), (3L, 30L)).toDF("id", "v").createOrReplaceTempView("cat_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING cat_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(spark.sql(s"SELECT id, v FROM $cat.t").as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 99L), (3L, 30L)))
  }

  test("CTAS, rename, drop") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src AS SELECT * FROM VALUES (1L), (2L) AS v(id)")
    assert(spark.sql(s"SELECT sum(id) FROM $cat.src").as[Long].head == 3L)
    spark.sql(s"ALTER TABLE $cat.src RENAME TO dst")
    assert(spark.sql(s"SELECT sum(id) FROM $cat.dst").as[Long].head == 3L)
    intercept[AnalysisException](spark.sql(s"SELECT * FROM $cat.src").collect())
    spark.sql(s"DROP TABLE $cat.dst")
    assert(Versioned.versions(spark, s"$wh/dst").isEmpty)
    intercept[AnalysisException](spark.sql(s"SELECT * FROM $cat.dst").collect())
  }

  test("ALTER TABLE ADD COLUMNS widens via mergeSchema; other changes refuse") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1)")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (s STRING, w BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 'b', 9)")
    // pre-widening rows surface NULL in the new columns
    assert(spark.sql(s"SELECT id, s, w FROM $cat.t")
      .as[(Long, Option[String], Option[Long])].collect().toSet ==
      Set((1L, None, None), (2L, Some("b"), Some(9L))))
    // the widening is itself a versioned commit — the narrow schema is
    // still time-travel-readable
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").columns.toSeq
      == Seq("id"))
    // RENAME COLUMN is now a metadata-only log commit (column mapping)
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN s TO s2")
    assert(spark.sql(s"SELECT * FROM $cat.t").columns.toSeq
      == Seq("id", "s2", "w"))
    // still-unmapped changes refuse with the alternatives named
    // (SET TBLPROPERTIES is mapped now — TblPropertiesSpec covers it)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN w COMMENT 'nope'"))
    assert(e.getMessage.contains("not mapped"))
  }

  test("partition transforms are rejected with the design pointer") {
    val (cat, _) = freshCatalog()
    val e = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.p (id BIGINT, d STRING) PARTITIONED BY (d)"))
    assert(e.getMessage.contains("clustering + zone maps"))
  }

  test("DSv2 reads zone-prune files from pushed predicates") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.z (id BIGINT, s STRING)")
    // three appends = three disjoint-id file sets, then a zone sidecar
    Seq(0L -> 100L, 1000L -> 1100L, 2000L -> 2100L).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO $cat.z " +
        s"SELECT id, concat('s', id) FROM range($lo, $hi)")
    }
    val dir = s"$wh/z"
    val head = Versioned.currentVersion(spark, dir).get
    Versioned.writeZoneMap(spark, dir, head, "id")
    val all = Versioned.filesAt(spark, dir, head).size

    def filesOf(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collectLeaves()
        .flatMap(_.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.inputRDD.partitions.length
        }).sum

    // correctness first: pruned reads return exactly the right rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.z WHERE id BETWEEN 1000 AND 1049")
      .as[Long].head == 50L)
    assert(spark.sql(s"SELECT sum(id) FROM $cat.z WHERE id >= 2000")
      .as[Long].head == (2000L until 2100L).sum)
    assert(spark.sql(s"SELECT count(*) FROM $cat.z WHERE id = 5000")
      .as[Long].head == 0L)
    // and the scan planned FEWER input partitions than the full file set
    // (each insert wrote >=1 file; the range predicate covers one insert)
    val prunedParts = filesOf(
      s"SELECT s FROM $cat.z WHERE id BETWEEN 1000 AND 1049")
    val fullParts = filesOf(s"SELECT s FROM $cat.z")
    assert(prunedParts < fullParts,
      s"zone pruning did not reduce the scan: $prunedParts vs $fullParts (files=$all)")
  }

  test("CALL procedures: compact, optimize, zone, history, restore") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, concat('a', id) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, concat('b', id) FROM range(50, 100)")
    val dir = s"$wh/db/t"

    val vCompact = spark.sql(s"CALL $cat.system.compact(table => 'db.t')")
      .as[Long].head
    assert(vCompact == 4L && Versioned.read(spark, dir).count() == 100L)

    val vOpt = spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', cluster_by => 'id')")
      .as[Long].head
    assert(vOpt == 5L)
    // the optimize republished zone stats: a bounded SQL read prunes
    assert(Versioned.prunedFiles(spark, dir, vOpt, "id", 0L, 5L).size
      < Versioned.filesAt(spark, dir, vOpt).size)

    // z-order CALLs: the full rewrite commits; the incremental run right
    // after is a no-op (NULL version — nothing unclustered remains)
    val vZ = spark.sql(
      s"CALL $cat.system.zorder(table => 'db.t', zorder_by => 'id')")
      .as[Long].head
    assert(vZ == 6L)
    val inc = spark.sql(
      s"CALL $cat.system.zorder_incremental(table => 'db.t', zorder_by => 'id')")
      .collect().head
    assert(inc.isNullAt(0))

    val hist = spark.sql(s"CALL $cat.system.history(table => 'db.t')")
    assert(hist.columns.toSeq == Seq("version", "op", "commit_ts", "n_files"))
    assert(hist.count() == 6L)
    // limit > 0 serves only the newest commits (the bounded walk)
    val hist2 = spark.sql(
      s"CALL $cat.system.history(table => 'db.t', limit => 2)")
    assert(hist2.select("version").as[Long].collect().toSeq ==
      hist.select("version").as[Long].collect().toSeq.takeRight(2))
    // detail: one summary row for the current snapshot
    val det = spark.sql(s"CALL $cat.system.detail(table => 'db.t')").collect()(0)
    assert(det.getAs[Long]("version") == 6L)
    assert(det.getAs[Long]("n_files") >= 1L && det.getAs[Long]("size_bytes") > 0L)

    val vRestore = spark.sql(
      s"CALL $cat.system.restore(table => 'db.t', version => 2)").as[Long].head
    assert(vRestore == 7L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").as[Long].head == 50L)

    // restore by wall clock (Delta's RESTORE ... TIMESTAMP AS OF):
    // v2's commit instant resolves back to v2's content
    val ts2 = hist.filter($"version" === 2L).select("commit_ts").as[Long].head()
    val vRestoreTs = spark.sql(
      s"CALL $cat.system.restore_asof(table => 'db.t', timestamp => '$ts2')")
      .as[Long].head
    assert(vRestoreTs == 8L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t").as[Long].head == 50L)
  }

  test("CALL procedures: shallow clone forks a table with zero data copy") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.db.src SELECT id, concat('a', id) FROM range(0, 20)")
    val v = spark.sql(
      s"CALL $cat.system.clone(source => 'db.src', target => 'db.fork')")
      .as[Long].head
    assert(v == 1L)
    // the fork reads the source snapshot and is a first-class catalog table
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.fork").as[Long].head == 20L)
    // zero data copied: no d-* dirs under the fork's root
    assert(!new java.io.File(s"$wh/db/fork").listFiles.toSeq
      .exists(f => f.isDirectory && f.getName.startsWith("d-")))
    // mutations stay on the fork
    spark.sql(s"INSERT INTO $cat.db.fork VALUES (100, 'x')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.fork").as[Long].head == 21L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.src").as[Long].head == 20L)
    // cloning onto an existing table is refused
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.clone(source => 'db.src', target => 'db.fork')")
    }
    // the pin lifecycle is SQL-reachable: list, then release
    val pins = spark.sql(s"CALL $cat.system.pins(table => 'db.src')")
    assert(pins.columns.toSeq == Seq("pin", "pinned_version", "n_files"))
    val pinName = pins.select("pin").as[String].head
    assert(pins.count() == 1L)
    spark.sql(
      s"CALL $cat.system.remove_pin(table => 'db.src', pin => '$pinName')")
    assert(spark.sql(s"CALL $cat.system.pins(table => 'db.src')").count() == 0L)
  }

  test("CALL procedures: constraints and vacuum with defaults") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2)")
    spark.sql(s"CALL $cat.system.add_constraint(table => 't', " +
      "name => 'positive', expr => 'id > 0')")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t VALUES (-5)").collect())
    assert(e.getMessage.contains("positive") || e.getMessage.contains("constraint"))
    spark.sql(s"CALL $cat.system.drop_constraint(table => 't', name => 'positive')")
    spark.sql(s"INSERT INTO $cat.t VALUES (-5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 3L)

    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (9)")
    // dry_run and keep_versions default (false, 1): old versions sweep
    val removed = spark.sql(s"CALL $cat.system.vacuum(table => 't')").count()
    assert(removed > 0)
    val eTT = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").collect())
    assert(eTT.getMessage.contains("vacuumed") ||
      eTT.getMessage.contains("does not exist"))
    assert(spark.sql(s"SELECT id FROM $cat.t").as[Long].collect().toSeq == Seq(9L))
  }

  test("racing INSERT INTO statements all land through the OCC retry") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.r (id BIGINT)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val inserts = (0 until 4).map { i =>
      scala.concurrent.Future {
        spark.sql(s"INSERT INTO $cat.r SELECT id + ${i * 100} FROM range(0, 50)")
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(inserts),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    // every statement's commit survived the version CAS races: 4 appends
    // after the CREATE, all 200 distinct rows present
    assert(spark.sql(s"SELECT count(*), count(DISTINCT id) FROM $cat.r")
      .as[(Long, Long)].head == ((200L, 200L)))
    assert(Versioned.versions(spark, s"$wh/r") == (1L to 5L))
  }

  test("namespace listing and drop semantics") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.a")
    spark.sql(s"CREATE NAMESPACE $cat.b")
    spark.sql(s"CREATE TABLE $cat.a.t (id BIGINT)")
    val nss = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0)).toSet
    assert(nss == Set("a", "b"))
    // a table dir is not a namespace
    assert(!nss.contains("t"))
    intercept[Exception](spark.sql(s"DROP NAMESPACE $cat.a").collect()) // non-empty
    spark.sql(s"DROP NAMESPACE $cat.a CASCADE")
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0)).toSet
      == Set("b"))
  }

  test("zone pruning on a TIMESTAMP column converts micros bounds to seconds") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.tz (id BIGINT, ts TIMESTAMP)")
    // two appends with disjoint time ranges -> two zoned file sets
    Seq(0L -> 100L, 100000L -> 100100L).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO $cat.tz " +
        s"SELECT id, timestamp_seconds(id) FROM range($lo, $hi)")
    }
    val dir = s"$wh/tz"
    val head = Versioned.currentVersion(spark, dir).get
    Versioned.writeZoneMap(spark, dir, head, "ts")
    // regression: timestamp literals are epoch MICROS while zone stats
    // are epoch SECONDS — un-converted bounds pruned EVERY file and the
    // reads below silently returned 0 rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.tz " +
      "WHERE ts >= timestamp_seconds(100000)").as[Long].head == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.tz WHERE ts BETWEEN " +
      "timestamp_seconds(50) AND timestamp_seconds(60)").as[Long].head == 11L)
    // and the conversion still PRUNES: the bounded read's file index
    // holds fewer files than the snapshot (count FILES, not RDD
    // partitions — tiny files pack many-per-partition and would mask
    // the pruning)
    def filesOf(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collectLeaves()
        .flatMap(_.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case s => // runtime-filterable wrapper carries its live count
                """files=(\d+)""".r.findFirstMatchIn(s.description())
                  .map(_.group(1).toInt).getOrElse(Int.MaxValue)
            }
        }).sum
    val pruned = filesOf(
      s"SELECT id FROM $cat.tz WHERE ts <= timestamp_seconds(99)")
    val full = filesOf(s"SELECT id FROM $cat.tz")
    assert(pruned < full, s"timestamp zone pruning inert: $pruned vs $full")
  }

  test("identifier parts cannot escape the warehouse root") {
    val (cat, wh) = freshCatalog()
    // backtick-quoted identifiers may carry path separators or dot-dots;
    // every catalog path builder must reject them before touching the fs
    // (dropTable is a recursive delete — traversal would be destructive)
    val bad = Seq(s"CREATE TABLE $cat.`..` (id BIGINT)",
      s"CREATE TABLE $cat.`a/b` (id BIGINT)",
      s"CREATE TABLE $cat.`x\\y` (id BIGINT)",
      s"DROP TABLE $cat.`..`.`..`.t")
    bad.foreach { stmt =>
      val e = intercept[Exception](spark.sql(stmt).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("not a legal") ||
        m.contains("path separators")), s"$stmt -> $e")
    }
    // plain names still work, and the warehouse root is intact
    spark.sql(s"CREATE TABLE $cat.ok (id BIGINT)")
    assert(Versioned.currentVersion(spark, s"$wh/ok").contains(1L))
  }

  test("zone pruning on DATE and DECIMAL columns") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.dz (id BIGINT, d DATE, m DECIMAL(12,2))")
    // two appends with disjoint date/amount ranges -> two zoned file sets
    spark.sql(s"INSERT INTO $cat.dz SELECT id, date_add(DATE'2020-01-01', " +
      "CAST(id AS INT)), CAST(id AS DECIMAL(12,2)) / 100 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.dz SELECT id, date_add(DATE'2021-01-01', " +
      "CAST(id - 1000 AS INT)), CAST(id AS DECIMAL(12,2)) / 100 " +
      "FROM range(1000, 1100)")
    val dir = s"$wh/dz"
    val head = Versioned.currentVersion(spark, dir).get
    Versioned.writeZoneMaps(spark, dir, head, Seq("d", "m"))
    def filesOf(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collectLeaves()
        .flatMap(_.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length
              case s => // runtime-filterable wrapper carries its live count
                """files=(\d+)""".r.findFirstMatchIn(s.description())
                  .map(_.group(1).toInt).getOrElse(Int.MaxValue)
            }
        }).sum
    val full = filesOf(s"SELECT id FROM $cat.dz")
    // DATE bound: epoch-day literal vs epoch-day stats
    assert(spark.sql(s"SELECT count(*) FROM $cat.dz WHERE d >= DATE'2021-01-01'")
      .as[Long].head == 100L)
    assert(filesOf(s"SELECT id FROM $cat.dz WHERE d >= DATE'2021-01-01'") < full)
    // DECIMAL bound with a fractional literal: file1 holds 0.00..0.99,
    // file2 10.00..10.99 — `> 0.995` keeps exactly file2's 100 rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.dz WHERE m > 0.995")
      .as[Long].head == 100L)
    assert(filesOf(s"SELECT id FROM $cat.dz WHERE m >= 10.00") < full)
    assert(spark.sql(s"SELECT count(*) FROM $cat.dz WHERE m >= 10.00")
      .as[Long].head == 100L)
    // equality on a value no row has (fractional beyond scale) is empty
    assert(spark.sql(s"SELECT count(*) FROM $cat.dz WHERE m = 0.005")
      .as[Long].head == 0L)
  }

  test("CREATE TABLE ... SHALLOW CLONE: the DDL spelling of cloneTable") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src (id BIGINT, s STRING)")
    spark.sql(s"INSERT INTO $cat.src VALUES (1, 'a'), (2, 'b')")
    val v = spark.sql(s"CREATE TABLE $cat.dst SHALLOW CLONE $cat.src")
      .as[Long].head()
    assert(v == 1L)
    assert(spark.sql(s"SELECT id, s FROM $cat.dst").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // zero data copied: the clone's root holds no d-* dirs
    assert(!new java.io.File(s"$wh/dst").exists() ||
      new java.io.File(s"$wh/dst").listFiles.forall(!_.getName.startsWith("d-")))
    // mutating the clone leaves the source untouched
    spark.sql(s"INSERT INTO $cat.dst VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.src").as[Long].head == 2L)
    // path-form identifiers work on either side
    val pdst = tmpDir("cat_clone_path")
    spark.sql(
      s"CREATE TABLE `graft-versioned`.`$pdst` SHALLOW CLONE $cat.src")
    assert(Versioned.read(spark, pdst).count() == 2L)
    // IF NOT EXISTS: an existing target is a no-op returning its head
    val again = spark.sql(
      s"CREATE TABLE IF NOT EXISTS $cat.dst SHALLOW CLONE $cat.src")
      .as[Long].head()
    assert(again == 2L) // dst's head after its own insert, not a re-clone
    // without IF NOT EXISTS an existing target is refused
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.dst SHALLOW CLONE $cat.src")
    }
    // ordinary statements still parse through the delegate, including
    // ones that merely contain the keyword in a literal
    assert(spark.sql("SELECT 'SHALLOW CLONE' AS s").as[String].head()
      == "SHALLOW CLONE")
    spark.sql(s"CREATE TABLE $cat.ctas (s STRING)")
    spark.sql(s"INSERT INTO $cat.ctas VALUES ('create table x shallow clone y')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ctas").as[Long].head == 1L)
  }

  test("SHALLOW CLONE VERSION/TIMESTAMP AS OF forks a historical snapshot") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src (id BIGINT, s STRING)")          // v1
    spark.sql(s"INSERT INTO $cat.src VALUES (1, 'a'), (2, 'b')")       // v2
    val tsV2 = spark.sql(s"CALL $cat.system.history(table => 'src')")
      .filter($"version" === 2L).select("commit_ts").as[Long].head()
    Thread.sleep(3)
    spark.sql(s"UPDATE $cat.src SET s = 'B' WHERE id = 2").collect()   // v3
    spark.sql(s"INSERT INTO $cat.src VALUES (3, 'c')")                 // v4
    // VERSION AS OF: the clone reads v2's rows, not the head's
    spark.sql(s"CREATE TABLE $cat.dst2 SHALLOW CLONE $cat.src VERSION AS OF 2")
    assert(spark.sql(s"SELECT id, s FROM $cat.dst2").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // TIMESTAMP AS OF resolves through the commit-timestamp index
    spark.sql(s"CREATE TABLE $cat.dst3 SHALLOW CLONE $cat.src " +
      s"TIMESTAMP AS OF '$tsV2'")
    assert(spark.sql(s"SELECT id, s FROM $cat.dst3").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // CALL system.clone(version => n) is the procedure spelling
    spark.sql(s"CALL $cat.system.clone(source => 'src', target => 'dst4', " +
      "version => 2)")
    assert(spark.sql(s"SELECT id, s FROM $cat.dst4").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    // the head clone still sees every mutation
    spark.sql(s"CREATE TABLE $cat.dst5 SHALLOW CLONE $cat.src")
    assert(spark.sql(s"SELECT id, s FROM $cat.dst5").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "B"), (3L, "c")))
    // a never-committed version refuses loudly
    val bad = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.dst9 SHALLOW CLONE $cat.src VERSION AS OF 99")
    }
    assert(bad.getMessage.contains("not retained"))
  }

  test("unsupported SHALLOW CLONE clauses refuse loudly; lookalikes delegate") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src (id BIGINT)")
    // clauses the grammar does not support name the supported form
    // instead of falling through to Spark's clone-less error
    Seq(
      s"CREATE OR REPLACE TABLE $cat.d SHALLOW CLONE $cat.src",
      s"CREATE TABLE $cat.d SHALLOW CLONE $cat.src LOCATION '/tmp/x'",
      s"CREATE TABLE $cat.d SHALLOW CLONE (SELECT * FROM $cat.src)",
      s"CREATE TABLE $cat.a b SHALLOW CLONE $cat.src",
      s"CREATE OR REPLACE TABLE $cat.d DEEP CLONE $cat.src",
      s"CREATE TABLE $cat.d DEEP CLONE $cat.src LOCATION '/tmp/x'"
    ).foreach { stmt =>
      val e = intercept[IllegalArgumentException](spark.sql(stmt))
      assert(e.getMessage.contains("[SHALLOW | DEEP] CLONE"), stmt)
      assert(e.getMessage.contains("supported grammar"), stmt)
    }
    // the keyword inside a line comment is NOT a clone: the statement
    // must delegate to Spark's parser and run normally
    spark.sql(s"CREATE TABLE $cat.c1 -- shallow clone\nAS SELECT 1 AS id")
    assert(spark.sql(s"SELECT id FROM $cat.c1").as[Int].head() == 1)
    // ... and inside a bracketed comment
    spark.sql(s"CREATE TABLE $cat.c2 /* shallow clone of nothing */ (id INT)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.c2").as[Long].head() == 0L)
  }
}
