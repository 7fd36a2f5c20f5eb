package graft

import org.apache.spark.sql.functions._

import graft.table.Versioned

/** Column mapping: metadata-only RENAME/DROP COLUMN as log-sized
  * commits — the physical name inside data files never changes, every
  * prior version time-travels under its own names, zone sidecars stay
  * keyed by physical name, and a re-added dropped name gets a fresh
  * physical identity (old values never resurface).
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  test("rename is log-sized: zero files move, values read under the new name") {
    val dir = tmpDir("colmap_rn")
    Versioned.append(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "v"), dir)
    val filesBefore = Versioned.filesAt(spark, dir, 1L)
    val v2 = Versioned.renameColumn(spark, dir, "v", "amount")
    assert(v2 == 2L)
    // the commit referenced the SAME files — nothing was rewritten
    assert(Versioned.filesAt(spark, dir, 2L) == filesBefore)
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "s", "amount"))
    assert(Versioned.read(spark, dir).select("id", "amount").as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
    // time travel preserves each version's OWN names
    assert(Versioned.readAt(spark, dir, 1L).columns.toSeq == Seq("id", "s", "v"))
    assert(Versioned.readAt(spark, dir, 1L).select("v").as[Long]
      .collect().toSet == Set(10L, 20L))
  }

  test("appends, merge, and row-level DML keep working on a renamed table") {
    val dir = tmpDir("colmap_ops")
    Versioned.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    Versioned.renameColumn(spark, dir, "v", "val2")
    // append under the NEW logical name — stored under the OLD physical
    Versioned.append(Seq((3L, 30L)).toDF("k", "val2"), dir)
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // merge addresses the new name end to end
    Versioned.merge(spark, dir, Seq((2L, 99L), (4L, 40L)).toDF("k", "val2"), Seq("k"))
    // updateWhere + deleteWhere over the renamed column
    Versioned.updateWhere(spark, dir, col("k") === 1L,
      Map("val2" -> (col("val2") + 5)))
    Versioned.deleteWhere(spark, dir, col("val2") === 30L)
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 15L), (2L, 99L), (4L, 40L)))
    // old-name references fail loudly (the logical schema moved on)
    intercept[Exception](Versioned.read(spark, dir).select("v").collect())
  }

  test("zone-map data skipping survives a rename (sidecars are physical-keyed)") {
    val dir = tmpDir("colmap_zone")
    Versioned.append(spark.range(0, 100).selectExpr("id", "id * 2 AS v"), dir)
    Versioned.append(spark.range(1000, 1100).selectExpr("id", "id * 2 AS v"), dir)
    Versioned.writeZoneMap(spark, dir, 2L, "id")
    Versioned.renameColumn(spark, dir, "id", "row_id")
    val head = Versioned.currentVersion(spark, dir).get
    // prunedFiles under the NEW logical name consults the base sidecar
    val pruned = Versioned.prunedFiles(spark, dir, head, "row_id", 0L, 99L)
    assert(pruned.size < Versioned.filesAt(spark, dir, head).size,
      s"no pruning after rename: $pruned")
    // and an append AFTER the rename carries + extends the sidecar
    Versioned.append(
      spark.range(5000, 5100).selectExpr("id AS row_id", "id * 2 AS v"), dir)
    val h2 = Versioned.currentVersion(spark, dir).get
    val pruned2 = Versioned.prunedFiles(spark, dir, h2, "row_id", 5000L, 5099L)
    // every pre-append file is provably out of range -> pruned; only
    // the fresh append's files (all in range) survive
    val preAppend = Versioned.filesAt(spark, dir, head).toSet
    assert(pruned2.nonEmpty && pruned2.forall(!preAppend.contains(_)),
      s"carried sidecar did not prune the old files: $pruned2")
  }

  test("drop hides the column; re-adding the name starts from NULL") {
    val dir = tmpDir("colmap_drop")
    Versioned.append(Seq((1L, "secret1", 10L), (2L, "secret2", 20L))
      .toDF("id", "s", "v"), dir)
    Versioned.dropColumn(spark, dir, "s")
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "v"))
    // prior version still carries it
    assert(Versioned.readAt(spark, dir, 1L).select("s").as[String]
      .collect().toSet == Set("secret1", "secret2"))
    // re-add the SAME name: old files' values must NOT resurface
    Versioned.append(
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        Versioned.read(spark, dir).schema.add("s", "string")),
      dir, mergeSchema = true)
    val rows = Versioned.read(spark, dir).select("id", "s")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, None), (2L, None)), s"dropped values resurfaced: $rows")
    // and new writes to the re-added column land fine
    Versioned.append(Seq((3L, 30L, "fresh")).toDF("id", "v", "s"), dir)
    assert(Versioned.read(spark, dir).filter(col("id") === 3L)
      .select("s").as[String].head == "fresh")
  }

  test("constraints referencing the column block rename and drop") {
    val dir = tmpDir("colmap_cons")
    Versioned.append(Seq((1L, 10L)).toDF("id", "v"), dir)
    Versioned.addConstraint(spark, dir, "v_pos", "v > 0")
    val e1 = intercept[IllegalArgumentException](
      Versioned.renameColumn(spark, dir, "v", "w"))
    assert(e1.getMessage.contains("v_pos"))
    val e2 = intercept[IllegalArgumentException](
      Versioned.dropColumn(spark, dir, "v"))
    assert(e2.getMessage.contains("v_pos"))
    // after dropping the constraint both proceed
    Versioned.dropConstraint(spark, dir, "v_pos")
    Versioned.renameColumn(spark, dir, "v", "w")
    assert(Versioned.read(spark, dir).columns.toSeq == Seq("id", "w"))
  }

  test("changes() across a pure rename commit is empty; OPTIMIZE materializes") {
    val dir = tmpDir("colmap_cdf")
    Versioned.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    Versioned.renameColumn(spark, dir, "v", "v2")
    // no file changed -> the snapshot diff cancels completely
    assert(Versioned.changes(spark, dir, 1L, 2L).isEmpty)
    // compaction rewrites the whole snapshot under logical names and
    // drops the mapping — the fast scan path is restored
    Versioned.compact(spark, dir)
    val head = Versioned.currentVersion(spark, dir).get
    val sch = Versioned.schemaAt(spark, dir, head).get
    assert(!Versioned.hasColumnMapping(sch))
    assert(Versioned.read(spark, dir).select("k", "v2").as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN on a catalog table") {
    val wh = tmpDir("colmap_cat")
    spark.conf.set("spark.sql.catalog.cmcat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cmcat.warehouse", wh)
    spark.sql("CREATE TABLE cmcat.t (id BIGINT, v BIGINT, junk STRING)")
    spark.sql("INSERT INTO cmcat.t VALUES (1, 10, 'x'), (2, 20, 'y')")
    spark.sql("ALTER TABLE cmcat.t RENAME COLUMN v TO amount")
    spark.sql("ALTER TABLE cmcat.t DROP COLUMN junk")
    // pure-SQL read of the renamed column (the V1 bridge path)
    assert(spark.sql("SELECT id, amount FROM cmcat.t ORDER BY id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
    assert(spark.sql("SELECT * FROM cmcat.t").columns.toSeq == Seq("id", "amount"))
    // time travel by name shows version-2's own schema
    assert(spark.sql("SELECT * FROM cmcat.t VERSION AS OF 2").columns.toSeq
      == Seq("id", "v", "junk"))
    // INSERT under the new shape keeps working
    spark.sql("INSERT INTO cmcat.t VALUES (3, 30)")
    assert(spark.sql("SELECT sum(amount) FROM cmcat.t").as[Long].head == 60L)
  }
}
