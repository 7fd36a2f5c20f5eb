package graft

import org.apache.spark.sql.functions._

import graft.table.Versioned

/** SQL `MERGE INTO` statement → Versioned.merge translation
  * (plans/SqlMerge.scala): the statement form must drive the identical
  * transactional machinery as the Scala API, and every unsupported
  * clause must fail at PLAN time with the Scala alternative named.
  */
class SqlMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = tmpDir("sqlmerge")
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "name", "ver"), dir)
    dir
  }

  private def mergeSql(dir: String, clauses: String): String =
    s"""MERGE INTO `graft-versioned`.`$dir` t
       |USING src s
       |ON t.k = s.k
       |$clauses""".stripMargin

  test("UPDATE SET * + INSERT * runs the LWW merge and returns the version") {
    val dir = freshTable()
    Seq((2L, "B", 99L), (3L, "stale", 1L), (4L, "d", 40L))
      .toDF("k", "name", "ver").createOrReplaceTempView("src")
    val out = spark.sql(mergeSql(dir,
      "WHEN MATCHED AND s.ver > t.ver THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *"))
    assert(out.columns.toSeq == Seq("version"))
    assert(out.head().getLong(0) == 2L) // append was v1, merge commits v2
    val rows = Versioned.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      (1L, "a", 10L),   // unmatched target: carried
      (2L, "B", 99L),   // matched, newer: source wins
      (3L, "c", 30L),   // matched, stale: target kept
      (4L, "d", 40L)))  // unmatched source: inserted
  }

  test("explicit SET column list limits the written columns") {
    val dir = freshTable()
    Seq((2L, "B", 99L)).toDF("k", "name", "ver").createOrReplaceTempView("src")
    spark.sql(mergeSql(dir,
      "WHEN MATCHED THEN UPDATE SET ver = s.ver " +
        "WHEN NOT MATCHED THEN INSERT *")).collect()
    val row2 = Versioned.read(spark, dir).filter(col("k") === 2L).head()
    assert(row2.getString(1) == "b" && row2.getLong(2) == 99L) // name kept, ver took source
  }

  test("no matched clause = insert-only merge (M1)") {
    val dir = freshTable()
    Seq((2L, "CHANGED", 99L), (5L, "e", 50L))
      .toDF("k", "name", "ver").createOrReplaceTempView("src")
    spark.sql(mergeSql(dir, "WHEN NOT MATCHED THEN INSERT *")).collect()
    val rows = Versioned.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))) // 2 untouched
  }

  test("full action grammar: matched DELETE, conditional clauses, BY SOURCE") {
    val dir = freshTable()
    Seq((1L, "A", 99L), (2L, "stale", 1L), (4L, "d", 40L), (5L, "e", 50L))
      .toDF("k", "name", "ver").createOrReplaceTempView("src")
    spark.sql(mergeSql(dir,
      """WHEN MATCHED AND s.ver > t.ver THEN UPDATE SET *
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.ver >= 50 THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.ver >= 30 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = upper(name)
        |""".stripMargin)).collect()
    val rows = Versioned.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      (1L, "A", 99L),   // matched, newer: clause 1 updates
      // 2: matched, stale -> clause 2 DELETE
      // 3: target-only, ver 30 -> by-source DELETE
      (5L, "e", 50L)),  // source-only, ver >= 50: conditional insert
      s"got $rows")
    // 4: source-only but ver 40 < 50 -> conditional insert skipped;
    // 1: target row before merge had ver 10 < 30 -> by-source UPDATE
    //    would have uppercased, but the row MATCHED (k=1 in source), so
    //    by-source clauses never see it — covered by k=1 keeping 'A'
  }

  test("matched SET accepts arbitrary sided expressions") {
    val dir = freshTable()
    Seq((2L, "B", 99L)).toDF("k", "name", "ver").createOrReplaceTempView("src")
    spark.sql(mergeSql(dir,
      "WHEN MATCHED THEN UPDATE SET name = concat(s.name, t.name), " +
        "ver = s.ver + t.ver WHEN NOT MATCHED THEN INSERT *")).collect()
    val row2 = Versioned.read(spark, dir).filter(col("k") === 2L).head()
    assert(row2.getString(1) == "Bb" && row2.getLong(2) == 119L)
  }

  test("delete-only merge needs no INSERT clause") {
    val dir = freshTable()
    Seq((2L, "B", 99L)).toDF("k", "name", "ver").createOrReplaceTempView("src")
    spark.sql(mergeSql(dir, "WHEN MATCHED THEN DELETE")).collect()
    assert(Versioned.read(spark, dir).select("k").as[Long].collect().toSet
      == Set(1L, 3L))
  }

  test("ill-formed clauses fail loudly at plan time") {
    val dir = freshTable()
    Seq((2L, "B", 99L)).toDF("k", "name", "ver").createOrReplaceTempView("src")
    def bad(clauses: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(mergeSql(dir, clauses)).collect())
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // unqualified condition ref in a matched clause: ambiguous between
    // identical schemas
    bad("WHEN MATCHED AND ver > 0 THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *", "qualified")
    // an unconditional non-last clause makes later clauses dead code
    // (Spark's own parser enforces this for SQL; Upsert.mergeFull
    // enforces it again for the Scala API)
    bad("WHEN MATCHED THEN UPDATE SET * WHEN MATCHED AND s.ver > 0 THEN " +
      "DELETE WHEN NOT MATCHED THEN INSERT *", "omit the condition")
    // side-scoped clauses reject the absent side
    bad("WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND t.ver > 0 " +
      "THEN INSERT *", "cannot reference target")
    bad("WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE AND s.ver > 0 THEN DELETE",
      "cannot reference source")
    // derived insert values: whole-source-row contract
    bad("WHEN NOT MATCHED THEN INSERT (k, name, ver) " +
      "VALUES (s.k, concat(s.name, 'x'), s.ver)", "whole SOURCE rows")
  }

  test("case-variant SET columns canonicalize; unknown SET columns refuse") {
    val dir = freshTable()
    Seq((2L, "B", 99L)).toDF("k", "name", "ver").createOrReplaceTempView("src")
    // SQL identifiers are case-insensitive: SET VER must hit column ver
    spark.sql(mergeSql(dir,
      "WHEN MATCHED THEN UPDATE SET VER = s.VER " +
        "WHEN NOT MATCHED THEN INSERT *")).collect()
    assert(Versioned.read(spark, dir).filter(col("k") === 2L).head().getLong(2) == 99L)
    val e = intercept[Exception](spark.sql(mergeSql(dir,
      "WHEN MATCHED THEN UPDATE SET vre = s.vre " +
        "WHEN NOT MATCHED THEN INSERT *")))
    assert(e.getMessage.contains("not a table column"))
  }

  test("an alias-free MERGE qualifies by the table name") {
    val wh = tmpDir("sqlmerge_cat")
    spark.conf.set("spark.sql.catalog.mcat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    spark.sql("CREATE TABLE mcat.orders (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO mcat.orders VALUES (1, 10)")
    Seq((1L, 99L), (2L, 20L)).toDF("k", "v").createOrReplaceTempView("m_src")
    spark.sql(
      """MERGE INTO mcat.orders USING m_src s ON orders.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(spark.sql("SELECT k, v FROM mcat.orders").as[(Long, Long)]
      .collect().toSet == Set((1L, 99L), (2L, 20L)))
  }

  test("a non-graft MERGE target is left to Spark's own path") {
    Seq((1L, 1L)).toDF("k", "v").createOrReplaceTempView("plain_target")
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("src")
    // a temp view is not a row-level-operation table: Spark must reject
    // it ITSELF (proving the rule didn't claim a non-graft statement)
    intercept[Exception](spark.sql(
      "MERGE INTO plain_target t USING src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"))
  }
}
