package graft

import graft.table.Versioned

/** RESTORE must carry per-file stats WITH the snapshot it restores:
  * the restored files were live at the restored version, so row
  * counts, zones, and string zones all resolve from that version's
  * chain. Regression: restore used to copy only the zones sidecar
  * verbatim, so `metaRowCountAt` went None after every restore —
  * demoting metadata `COUNT(*)` to a table scan on the exact tables
  * (rollback-after-bad-load) where operators run it most.
  */
class RestoreStatsSpec extends SparkSpec {

  test("restore carries row counts, zones, and string zones from the restored version") {
    val wh = tmpDir("rst_wh")
    spark.conf.set("spark.sql.catalog.rst", "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rst.warehouse", wh)
    spark.sql("CREATE NAMESPACE rst.db")
    spark.sql("CREATE TABLE rst.db.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO rst.db.t SELECT id, concat('k', id) FROM range(0, 100)")
    spark.sql("INSERT INTO rst.db.t SELECT id + 100, concat('k', id + 100) FROM range(0, 50)")
    val dir = s"$wh/db/t"
    Versioned.writeZoneMaps(spark, dir, 3L, Seq("id", "s"))
    spark.sql("DELETE FROM rst.db.t WHERE id % 5 = 0").collect() // v4
    spark.sql("RESTORE TABLE rst.db.t TO VERSION AS OF 3").collect() // v5
    val head = Versioned.currentVersion(spark, dir).get
    assert(head == 5L)
    // row counts: COUNT(*) stays a metadata answer after the rollback
    assert(Versioned.metaRowCountAt(spark, dir, head).contains(150L),
      "restore must carry row-stat coverage from the restored version")
    // zones: a bounded read on the restored snapshot still prunes
    val all = Versioned.filesAt(spark, dir, head)
    val pruned = Versioned.prunedFiles(spark, dir, head, "id", 0L, 10L)
    assert(pruned.size < all.size, s"zones must carry: $pruned vs $all")
    assert(Versioned.readWhere(spark, dir, head, "id", 0L, 10L).count() == 11L)
    // string zones: the point probe form carries too
    assert(Versioned.readWhereStr(
      spark, dir, head, "s", Some("k7"), Some("k7")).count() == 1L)
  }
}
