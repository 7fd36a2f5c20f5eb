package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** `table_changes(table, from[, to])` — the statement-level change-feed
  * entry (Delta's TVF): pure SQL reads the same per-commit CDF plan the
  * DSv2 option path serves, by catalog name or table path, with
  * Delta's INCLUSIVE version bounds.
  */
class TableChangesTvfSpec extends SparkSpec {

  import spark.implicits._

  private def build(dir: String): Unit = {
    Versioned.append(Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "s", "v"), dir) // v1
    Versioned.append(Seq((3, "c", 30L)).toDF("id", "s", "v"), dir)                // v2
    Versioned.updateWhere(spark, dir, col("id") === 2,
      Map("v" -> lit(99L)))                                                       // v3
    Versioned.deleteWhere(spark, dir, col("id") === 1)                            // v4
  }

  test("path form matches the DSv2 option path, inclusive version bounds") {
    val dir = tmpDir("tvf_path")
    build(dir)
    // inclusive 3..4 == the option path's exclusive startingVersion 2
    val viaTvf = spark.sql(
      s"SELECT id, s, v, _change_type, _commit_version " +
        s"FROM table_changes('$dir', 3, 4)")
      .as[(Int, String, Long, String, Long)].collect().toSet
    val viaOptions = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 4)
      .load(dir)
      .select("id", "s", "v", "_change_type", "_commit_version")
      .as[(Int, String, Long, String, Long)].collect().toSet
    assert(viaTvf == viaOptions)
    assert(viaTvf.map(_._4) == Set("update_preimage", "update_postimage", "delete"))
  }

  test("`to` defaults to the head; from=1 covers the table's whole history") {
    val dir = tmpDir("tvf_head")
    build(dir)
    val feed = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM table_changes('$dir', 3) " +
        "GROUP BY _change_type")
      .as[(String, Long)].collect().toMap
    assert(feed == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "delete" -> 1L))
    // from=1 serves the REAL per-commit feed from the table's birth
    // (Delta's batch convention) — v1's rows as inserts tagged 1, then
    // each commit's changes at its own version — NOT the head-snapshot
    // initial-snapshot mode (which only an absent start bound selects)
    val all = spark.sql(
      s"SELECT id, _change_type, _commit_version FROM table_changes('$dir', 1)")
      .as[(Int, String, Long)].collect().toSet
    assert(all == Set(
      (1, "insert", 1L), (2, "insert", 1L), (3, "insert", 2L),
      (2, "update_preimage", 3L), (2, "update_postimage", 3L),
      (1, "delete", 4L)))
  }

  test("catalog-name form resolves through a registered GraftCatalog") {
    val wh = tmpDir("tvf_wh")
    spark.conf.set("spark.sql.catalog.tvf_cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tvf_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE tvf_cat.cdc")
    spark.sql("CREATE TABLE tvf_cat.cdc.t (id INT, v BIGINT)") // v1 schema-only
    spark.sql("INSERT INTO tvf_cat.cdc.t VALUES (1, 10), (2, 20)") // v2
    spark.sql("UPDATE tvf_cat.cdc.t SET v = 99 WHERE id = 2")      // v3
    val feed = spark.sql(
      "SELECT id, v, _change_type, _commit_version " +
        "FROM table_changes('tvf_cat.cdc.t', 3, 3)")
      .as[(Int, Long, String, Long)].collect().toSet
    assert(feed == Set(
      (2, 20L, "update_preimage", 3L), (2, 99L, "update_postimage", 3L)))
  }

  test("timestamp bounds resolve through the commit-timestamp index") {
    val dir = tmpDir("tvf_ts")
    build(dir)
    // every commit is at/after the epoch → the FIRST commit is the
    // start: the per-commit feed from the table's birth (v1 inserts
    // tagged 1, then each commit's changes — same rows as from=1)
    val rows = spark.sql(
      s"SELECT _change_type, _commit_version " +
        s"FROM table_changes('$dir', '1970-01-01 00:00:00')")
      .as[(String, Long)].collect().toSeq
    assert(rows.size == 6)
    assert(rows.count(_ == ("insert", 1L)) == 2)
    val full = spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', '1970-01-01', '2999-01-01')")
      .as[Long].head()
    assert(full == 6L) // full-history window == the from=1 feed
  }

  test("ill-formed calls fail loudly") {
    val dir = tmpDir("tvf_bad")
    build(dir)
    intercept[Exception] { // from version below 1
      spark.sql(s"SELECT * FROM table_changes('$dir', 0)").collect()
    }
    intercept[Exception] { // not a catalog table, not a path
      spark.sql("SELECT * FROM table_changes('no_such.cat.t', 1)").collect()
    }
    intercept[Exception] { // non-literal bound
      spark.sql(s"SELECT * FROM table_changes('$dir', id)").collect()
    }
  }
}
