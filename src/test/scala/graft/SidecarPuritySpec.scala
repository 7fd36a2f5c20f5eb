package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, input_file_name, max, min}

import graft.table.Versioned

/** Content-derived-metadata audit (the round-15 bug class): every
  * per-file sidecar — row counts, long zones, string zones, bloom —
  * must describe the ROWS of its file, never the write task that
  * produced it. The hazardous plan that exposed the bucket-tag bug is
  * reused for every family: a DISTINCT upstream leaves the input
  * already hash-partitioned, AQE coalesces the exchange to ONE task,
  * and `maxRecordsPerFile` makes that single task emit SEVERAL files —
  * so any metadata keyed off task/partition identity would stamp all
  * of them with the same (wrong) stats. Each test compares the sidecar
  * against a per-file ground truth re-read keyed by `input_file_name`.
  */
class SidecarPuritySpec extends SparkSpec {
  import spark.implicits._

  /** One hazardous-shape commit: DISTINCT (hash-partitioned upstream,
    * AQE coalesces 4 shuffle partitions to one write task) split into
    * several files by `maxRecordsPerFile`. Returns the table dir.
    */
  private def hazardousTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    val src = spark.range(0, 400)
      .selectExpr("CASE WHEN id % 5 < 4 THEN 7 ELSE id % 11 END AS k")
    val haz = src.distinct()
      .selectExpr("k", "concat('s-', lpad(CAST(k AS STRING), 3, '0')) AS s",
        "k * 3 AS v")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try Versioned.append(haz, dir)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val files = Versioned.filesAt(spark, dir, 1L)
    assert(files.size >= 2,
      s"fixture must split one write task into several files: $files")
    dir
  }

  /** Ground truth per REL file path from re-reading the snapshot:
    * rel → rows of that file, via the same rel-suffix mapping the
    * sidecars key on.
    */
  private def byFile(dir: String, v: Long): Map[String, DataFrame] = {
    val all = Versioned.readAt(spark, dir, v)
      .withColumn("f", input_file_name())
    Versioned.filesAt(spark, dir, v).map { rel =>
      rel -> all.filter(col("f").endsWith(rel)).drop("f")
    }.toMap
  }

  test("row-count sidecar matches each file's own rows under the hazardous plan") {
    val dir = hazardousTable("sp_rows")
    val counts = Versioned.rowCountsAt(spark, dir, 1L)
    assert(counts.isDefined, "the commit must publish a row sidecar")
    val truth = byFile(dir, 1L).view.mapValues(_.count()).toMap
    assert(counts.get == truth,
      s"per-file counts must be content-pure: sidecar=${counts.get} truth=$truth")
    assert(truth.values.sum == 11L) // {7} ∪ {0..10}
  }

  test("long zone maps record each file's own [lo, hi] under the hazardous plan") {
    val dir = hazardousTable("sp_zones")
    Versioned.writeZoneMaps(spark, dir, 1L, Seq("k"))
    val files = Versioned.filesAt(spark, dir, 1L)
    byFile(dir, 1L).foreach { case (rel, rows) =>
      val Array(lo, hi) = rows.agg(min("k"), max("k")).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
      // the file's own range survives a point probe at both endpoints…
      assert(Versioned.prunedFiles(spark, dir, 1L, "k", lo, lo).contains(rel),
        s"zone for $rel must admit its own min $lo")
      assert(Versioned.prunedFiles(spark, dir, 1L, "k", hi, hi).contains(rel),
        s"zone for $rel must admit its own max $hi")
    }
    // …and every row of the table is reachable through zoned point reads
    val keys = Versioned.readAt(spark, dir, 1L)
      .select("k").as[Long].collect().toSeq
    keys.foreach { k =>
      assert(Versioned.readWhere(spark, dir, 1L, "k", k, k).count() >= 1L,
        s"zoned point read must find k=$k")
    }
    // a task-stamped zone would make all files identical; at least one
    // file must have a range narrower than the table's
    val (tlo, thi) = (keys.min, keys.max)
    val narrower = files.exists { rel =>
      !Versioned.prunedFiles(spark, dir, 1L, "k", tlo, tlo).contains(rel) ||
        !Versioned.prunedFiles(spark, dir, 1L, "k", thi, thi).contains(rel)
    }
    assert(narrower, "zones must differ per file, not echo the task's range")
  }

  test("string zones admit each file's own values under the hazardous plan") {
    val dir = hazardousTable("sp_szones")
    Versioned.writeZoneMaps(spark, dir, 1L, Seq("s"))
    byFile(dir, 1L).foreach { case (rel, rows) =>
      rows.select("s").as[String].collect().foreach { sv =>
        assert(Versioned.strPrunedFiles(
          spark, dir, 1L, "s", Some(sv), Some(sv)).contains(rel),
          s"string zone for $rel must admit its own value '$sv'")
        assert(Versioned.readWhereStr(
          spark, dir, 1L, "s", Some(sv), Some(sv)).count() == 1L)
      }
    }
  }

  test("bloom filters claim each file's own values under the hazardous plan") {
    val dir = hazardousTable("sp_bloom")
    Versioned.buildBloom(spark, dir, Seq("s"), itemsPerFile = 1000L)
    byFile(dir, 1L).foreach { case (rel, rows) =>
      rows.select("s").as[String].collect().foreach { sv =>
        assert(Versioned.bloomPrunedFiles(spark, dir, 1L, "s", sv)
          .contains(rel),
          s"bloom for $rel must claim its own value '$sv' (false negative)")
        assert(Versioned.readWhereEquals(spark, dir, 1L, "s", sv).count() == 1L)
      }
    }
  }

  test("bucketed insert publishes content-pure row counts under the hazardous plan") {
    // the exact round-15 shape, now auditing the ROW sidecar beside the
    // tags BucketSpjSpec pins: DISTINCT upstream, repartition elided,
    // AQE packs several buckets into one write task → partitionBy emits
    // one file per bucket FROM THE SAME TASK; WriteCounts must refuse
    // the ambiguous indices and the footer fallback must stay per-file
    val wh = tmpDir("sp_bwh")
    val cat = "sp_bcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.dim (uk BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, uk))")
    spark.range(0, 500)
      .selectExpr("CASE WHEN id % 5 < 4 THEN 7 ELSE id % 11 END AS uk")
      .createOrReplaceTempView("sp_bsrc")
    spark.sql(s"INSERT INTO $cat.db.dim " +
      "SELECT uk, uk * 7 AS w FROM (SELECT DISTINCT uk FROM sp_bsrc)")
    val dir = s"$wh/db/dim"
    val head = Versioned.currentVersion(spark, dir).get
    val counts = Versioned.rowCountsAt(spark, dir, head)
    assert(counts.isDefined, "the bucketed commit must publish a row sidecar")
    val truth = byFile(dir, head).view.mapValues(_.count()).toMap
      .filter(_._2 > 0L) // the CREATE commit's empty seed file may linger
    truth.foreach { case (rel, n) =>
      assert(counts.get.get(rel).contains(n),
        s"bucketed per-file count for $rel: sidecar=${counts.get.get(rel)} truth=$n")
    }
    assert(Versioned.metaRowCountAt(spark, dir, head).contains(11L))
  }
}
