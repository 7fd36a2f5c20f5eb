package graft

import org.apache.spark.sql.functions.col

import graft.table.Versioned

/** Per-file Bloom indexes (Databricks BLOOMFILTER INDEX analog): the
  * equality-probe data-skipping complement of zone maps — a
  * random-distributed high-cardinality key spans every file's zone
  * range, but a bloom rules files out per value. False positives and
  * unstatted files only WIDEN the scan; the residual predicate and DV
  * subtraction keep rows exact.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files, ids partitioned by range so each value lives in exactly
    * one file — the pruning assertion substrate.
    */
  private def mkTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    (0 to 3).foreach { p =>
      Versioned.append(
        (1L to 25L).map(i => (p * 25L + i, s"k-${p * 25L + i}"))
          .toDF("id", "key").coalesce(1), dir)
    }
    assert(Versioned.filesAt(spark, dir, 4L).size == 4)
    dir
  }

  test("a bloom build prunes equality probes to a strict file subset, rows exact") {
    val dir = mkTable("bl_basic")
    val v = Versioned.buildBloom(spark, dir, Seq("key"), fpp = 0.01,
      itemsPerFile = 1000L)
    assert(v == 4L)
    val all = Versioned.filesAt(spark, dir, 4L)
    val pruned = Versioned.bloomPrunedFiles(spark, dir, 4L, "key", "k-30")
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"bloom must rule out files for a single-file value: $pruned")
    assert(Versioned.readWhereEquals(spark, dir, 4L, "key", "k-30")
      .as[(Long, String)].collect().toSeq == Seq((30L, "k-30")))
    // a value in NO file: with 100 keys/file at fpp 1% the probe
    // deterministically (fixed data, fixed hash) prunes everything
    assert(Versioned.readWhereEquals(spark, dir, 4L, "key", "absent").count() == 0)
  }

  test("files appended after the build are never pruned (no stats widens, never loses)") {
    val dir = mkTable("bl_fresh")
    Versioned.buildBloom(spark, dir, Seq("key"), itemsPerFile = 1000L) // at v4
    Versioned.append(Seq((999L, "fresh")).toDF("id", "key").coalesce(1), dir) // v5
    val pruned = Versioned.bloomPrunedFiles(spark, dir, 5L, "key", "fresh")
    // the fresh file has no entry in the v4 build → must stay in
    assert(Versioned.readWhereEquals(spark, dir, 5L, "key", "fresh")
      .as[(Long, String)].collect().toSeq == Seq((999L, "fresh")))
    assert(pruned.exists(f => !Versioned.filesAt(spark, dir, 4L).contains(f)),
      "the un-statted fresh file must survive pruning")
  }

  test("time travel BEFORE the build still prunes exactly (entries keyed by immutable files)") {
    val dir = mkTable("bl_tt")
    Versioned.append(Seq((999L, "late")).toDF("id", "key").coalesce(1), dir) // v5
    Versioned.buildBloom(spark, dir, Seq("key"), itemsPerFile = 1000L) // at v5
    // reading v4 (pre-build): v4's files are all statted in the v5
    // build... but the build is AT v5 > v4 — latestPointerAt(4) finds
    // nothing → no pruning, full correctness
    assert(Versioned.bloomPrunedFiles(spark, dir, 4L, "key", "k-30").size ==
      Versioned.filesAt(spark, dir, 4L).size)
    // at v5 the build applies
    assert(Versioned.bloomPrunedFiles(spark, dir, 5L, "key", "k-30").size < 5)
  }

  test("DV-deleted rows never resurface through a bloom-pruned read") {
    val dir = mkTable("bl_dv")
    Versioned.buildBloom(spark, dir, Seq("key"), itemsPerFile = 1000L) // at v4
    Versioned.deleteWhereMoR(spark, dir, col("id") === 30L) // v5: DV
    // the bloom (built from raw bytes) still routes to the file; the
    // DV subtraction must erase the row
    assert(Versioned.readWhereEquals(spark, dir, 5L, "key", "k-30").count() == 0)
    assert(Versioned.readWhereEquals(spark, dir, 5L, "key", "k-31").count() == 1)
  }

  test("renamed columns keep pruning through physical names") {
    val dir = mkTable("bl_rename")
    Versioned.buildBloom(spark, dir, Seq("key"), itemsPerFile = 1000L)
    Versioned.renameColumn(spark, dir, "key", "label") // v5: logical rename
    val v = Versioned.currentVersion(spark, dir).get
    assert(Versioned.readWhereEquals(spark, dir, v, "label", "k-30")
      .select("id").as[Long].collect().toSeq == Seq(30L))
    assert(Versioned.bloomPrunedFiles(spark, dir, v, "label", "k-30").size < 4)
  }

  test("the DDL spelling builds the index; bad shapes refuse with the grammar named") {
    val dir = mkTable("bl_ddl")
    val rows = spark.sql(
      "CREATE BLOOMFILTER INDEX ON TABLE `graft-versioned`.`" + dir + "` " +
        "FOR COLUMNS (key) OPTIONS (fpp = 0.02, itemsPerFile = 500)").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(4L))
    assert(Versioned.bloomPrunedFiles(spark, dir, 4L, "key", "k-30").size < 4)
    val e = intercept[Exception] {
      spark.sql(s"CREATE BLOOMFILTER INDEX ON `graft-versioned`.`$dir`")
    }
    assert(e.getMessage.contains("BLOOMFILTER INDEX ON TABLE"))
    // unknown column refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      Versioned.buildBloom(spark, dir, Seq("nope"))
    }
    assert(e2.getMessage.contains("no such column"))
  }
}
