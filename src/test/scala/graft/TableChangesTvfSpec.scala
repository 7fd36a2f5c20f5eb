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
    // from=1 is the engine's "since the table's birth" mode: the full
    // `to` snapshot as inserts (the same rule the streaming CDF source
    // applies to its initial snapshot), tagged with the head version
    val all = spark.sql(
      s"SELECT _change_type, _commit_version FROM table_changes('$dir', 1)")
      .as[(String, Long)].collect().toSeq
    assert(all.size == 2 && all.forall(_ == ("insert", 4L)))
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
    // start, which is the initial-snapshot mode: head rows as inserts
    val rows = spark.sql(
      s"SELECT _change_type FROM table_changes('$dir', '1970-01-01 00:00:00')")
      .as[String].collect().toSeq
    assert(rows.size == 2 && rows.forall(_ == "insert"))
    // a start AFTER the last commit has nothing to report
    val none = spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', '1970-01-01', '2999-01-01')")
      .as[Long].head()
    assert(none == 2L) // full-history window: still the snapshot mode
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
