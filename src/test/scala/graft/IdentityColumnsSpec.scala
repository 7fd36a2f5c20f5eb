package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** IDENTITY columns (Delta's `GENERATED {ALWAYS | BY DEFAULT} AS
  * IDENTITY`): declared as `graft.identity.<col>` properties with a
  * transactional high-water mark beside them; appends assign
  * contiguous `start, start+step, …` values to omitted/NULL rows,
  * `ALWAYS` refuses explicit values row-side, `BY DEFAULT` keeps
  * them, merges enforce NOT NULL, and the SQL spelling works end to
  * end through the catalog capability.
  */
class IdentityColumnsSpec extends SparkSpec {

  import spark.implicits._

  test("assignment: contiguous values, continuation across appends, start/step") {
    val dir = tmpDir("id_assign")
    Versioned.overwrite(
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        Seq((0L, "")).toDF("id", "s").schema), dir)                       // v1
    Versioned.setIdentityColumn(spark, dir, "id", start = 100L, step = 10L)
    // batch omits the column entirely
    Versioned.append(Seq("a", "b", "c").toDF("s"), dir)
    val ids1 = Versioned.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids1.toSeq == Seq(100L, 110L, 120L))
    // the next batch continues from the committed high-water mark
    Versioned.append(Seq("d", "e").toDF("s"), dir)
    val ids2 = Versioned.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids2.toSeq == Seq(100L, 110L, 120L, 130L, 140L))
    // NULL-presenting rows assign too (what SQL INSERT delivers)
    Versioned.append(
      Seq((Option.empty[Long], "f")).toDF("id", "s"), dir)
    assert(Versioned.read(spark, dir).select("id").as[Long].collect().sorted
      .toSeq == Seq(100L, 110L, 120L, 130L, 140L, 150L))
  }

  test("ALWAYS refuses explicit values; BY DEFAULT keeps them") {
    val dir = tmpDir("id_always")
    Versioned.append(Seq((1L, "seed")).toDF("id", "s"), dir)              // v1
    Versioned.setIdentityColumn(spark, dir, "id", start = 10L)
    val e = intercept[Exception] {
      Versioned.append(Seq((99L, "x")).toDF("id", "s"), dir)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS") ||
      Option(e.getCause).exists(_.getMessage.contains("GENERATED ALWAYS")))
    val dir2 = tmpDir("id_bydefault")
    Versioned.append(Seq((1L, "seed")).toDF("id", "s"), dir2)
    Versioned.setIdentityColumn(spark, dir2, "id", start = 10L,
      allowExplicit = true)
    Versioned.append(
      Seq((Some(99L), "x"), (None, "y")).toDF("id", "s"), dir2)
    val got = Versioned.read(spark, dir2).as[(Long, String)].collect()
      .map(_.swap).toMap
    // explicit rows consume their row index too (identity allows gaps,
    // Delta's own contract): x sits at index 0, so y assigns 9 + 2·1
    assert(got("x") == 99L && got("y") == 11L && got("seed") == 1L)
  }

  test("declaring on a populated table continues past the existing max") {
    val dir = tmpDir("id_pop")
    Versioned.append(
      (1 to 5).map(i => (i * 100L, s"r$i")).toDF("id", "s"), dir)         // max 500
    Versioned.setIdentityColumn(spark, dir, "id", start = 1L)
    Versioned.append(Seq("new1", "new2").toDF("s"), dir)
    val ids = Versioned.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(100L, 200L, 300L, 400L, 500L, 501L, 502L))
  }

  test("merge output enforces NOT NULL on the identity column") {
    val dir = tmpDir("id_merge")
    Versioned.append(Seq((1L, 5L)).toDF("id", "x"), dir)
    Versioned.setIdentityColumn(spark, dir, "id", allowExplicit = true)
    // a source row with a NULL identity cannot insert through a merge
    val e = intercept[IllegalArgumentException] {
      Versioned.merge(spark, dir,
        Seq((Option.empty[Long], 9L)).toDF("id", "x"), Seq("x"))
    }
    assert(e.getMessage.contains("identity_id"))
  }

  test("SQL: CREATE TABLE ... GENERATED ALWAYS AS IDENTITY end to end") {
    val cat = "idcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("idwh"))
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT GENERATED ALWAYS AS " +
      "IDENTITY (START WITH 5 INCREMENT BY 5), s STRING)")
    spark.sql(s"INSERT INTO $cat.db.t (s) VALUES ('a'), ('b')")
    spark.sql(s"INSERT INTO $cat.db.t (s) VALUES ('c')")
    val got = spark.sql(s"SELECT id, s FROM $cat.db.t")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(5L, 10L, 15L))
    assert(got.map(_._2).toSet == Set("a", "b", "c"))
    // the procedure spelling declares on an existing table
    spark.sql(s"CREATE TABLE $cat.db.u (k BIGINT, s STRING)")
    spark.sql(s"CALL $cat.system.set_identity(table => 'db.u', " +
      "column => 'k', start => 7)")
    spark.sql(s"INSERT INTO $cat.db.u (s) VALUES ('z')")
    assert(spark.sql(s"SELECT k FROM $cat.db.u").as[Long].head() == 7L)
  }
}
