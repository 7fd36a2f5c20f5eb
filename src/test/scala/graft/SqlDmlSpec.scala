package graft

import graft.table.Versioned

/** SQL DELETE/UPDATE statements must drive the same copy-on-write
  * rewrites as the Scala deleteWhere/updateWhere, on both the
  * path-form relation and catalog-named targets.
  */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  test("UPDATE then DELETE by path match the Scala API") {
    val dir = tmpDir("sqldml")
    Versioned.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (14L, "b", 40L))
        .toDF("id", "k", "v"), dir)
    val vUp = spark.sql(s"UPDATE `graft-versioned`.`$dir` SET v = v * 2 WHERE k = 'a'")
      .as[java.lang.Long].head
    assert(vUp == 2L)
    val vDel = spark.sql(s"DELETE FROM `graft-versioned`.`$dir` WHERE id % 7 = 0")
      .as[java.lang.Long].head
    assert(vDel == 3L)
    assert(Versioned.read(spark, dir).select("id", "v").as[(Long, Long)]
      .collect().toSet == Set((1L, 20L), (2L, 20L), (3L, 60L)))
    // old snapshot intact (copy-on-write, not in-place)
    assert(Versioned.readAt(spark, dir, 1L).count() == 4L)
  }

  test("no-match DELETE commits nothing and returns NULL") {
    val dir = tmpDir("sqldml_nm")
    Versioned.append(Seq((1L, 5L)).toDF("id", "v"), dir)
    val r = spark.sql(s"DELETE FROM `graft-versioned`.`$dir` WHERE id > 100").collect()
    assert(r.head.isNullAt(0))
    assert(Versioned.currentVersion(spark, dir).contains(1L))
  }

  test("DML on a catalog-named table") {
    val wh = tmpDir("sqldml_cat")
    spark.conf.set("spark.sql.catalog.dmlcat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dmlcat.warehouse", wh)
    spark.sql("CREATE TABLE dmlcat.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dmlcat.t VALUES (1, 1), (2, 2), (3, 3)")
    spark.sql("UPDATE dmlcat.t SET v = v + 10 WHERE id >= 2")
    spark.sql("DELETE FROM dmlcat.t WHERE id = 3")
    assert(spark.sql("SELECT id, v FROM dmlcat.t").as[(Long, Long)]
      .collect().toSet == Set((1L, 1L), (2L, 12L)))
  }

  test("TRUNCATE TABLE empties the head snapshot, keeps history") {
    val dir = tmpDir("sqldml_tr")
    Versioned.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v = spark.sql(s"TRUNCATE TABLE `graft-versioned`.`$dir`")
      .as[Long].head
    assert(v == 2L)
    assert(Versioned.read(spark, dir).isEmpty)
    // schema survives the truncate; prior version still readable
    assert(Versioned.read(spark, dir).schema.fieldNames.toSeq == Seq("id", "s"))
    assert(Versioned.readAt(spark, dir, 1L).count() == 2L)
  }

  test("TRUNCATE TABLE on a catalog name") {
    val wh = tmpDir("sqldml_trcat")
    spark.conf.set("spark.sql.catalog.trcat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.trcat.warehouse", wh)
    spark.sql("CREATE TABLE trcat.t (id BIGINT)")
    spark.sql("INSERT INTO trcat.t VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE trcat.t")
    assert(spark.sql("SELECT count(*) FROM trcat.t").as[Long].head == 0L)
    assert(spark.sql("SELECT count(*) FROM trcat.t VERSION AS OF 2").as[Long].head == 2L)
  }

  test("path-form INSERT INTO / OVERWRITE commit through the log") {
    val dir = tmpDir("sqldml_ins")
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), dir)
    val rel = s"`graft-versioned`.`$dir`"
    // by-position append with an implicit cast (INT literal -> BIGINT col)
    val v2 = spark.sql(s"INSERT INTO $rel VALUES (2, 'b'), (3, 'c')").as[Long].head
    assert(v2 == 2L)
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // INSERT OVERWRITE is a LOG commit: new snapshot, old files intact
    spark.sql(s"INSERT OVERWRITE $rel SELECT id + 10, s FROM $rel VERSION AS OF 1")
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSet
      == Set((11L, "a")))
    assert(Versioned.readAt(spark, dir, 2L).count() == 3L)
    // column lists are refused loudly, never silently misaligned
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $rel (id) VALUES (9)"))
    assert(e.getMessage.contains("column lists"))
  }

  test("qualified refs strip to the table's columns") {
    val dir = tmpDir("sqldml_q")
    Versioned.append(Seq((1L, 2L), (5L, 6L)).toDF("id", "v"), dir)
    spark.sql(s"UPDATE `graft-versioned`.`$dir` AS t SET v = t.v + t.id WHERE t.id > 2")
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 2L), (5L, 11L)))
  }

  test("UPDATE SET accepts case-variant column names, rejects unknown ones") {
    val dir = tmpDir("sqldml_case")
    Versioned.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "value_c"), dir)
    val rel = s"`graft-versioned`.`$dir`"
    // SQL identifiers are case-insensitive by default: Value_C must
    // resolve to the committed value_c (regression: exact-case matching
    // failed this statement)
    spark.sql(s"UPDATE $rel SET Value_C = Value_C + 5 WHERE id = 1")
    assert(Versioned.read(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 15L), (2L, 20L)))
    val e = intercept[IllegalArgumentException](
      spark.sql(s"UPDATE $rel SET nope = 1"))
    assert(e.getMessage.contains("not a table column"))
    assert(e.getMessage.contains("value_c")) // schema named in the error
  }

  test("path-form INSERT casts with store-assignment semantics") {
    val dir = tmpDir("sqldml_sa")
    // id is INT (Scala Int -> IntegerType)
    Versioned.append(Seq((1, "a")).toDF("id", "s"), dir)
    val rel = s"`graft-versioned`.`$dir`"
    // default storeAssignmentPolicy=ANSI: a BIGINT literal overflowing
    // the INT column must ERROR like a catalog-table INSERT would —
    // regression: the plain lax cast silently wrote NULL
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $rel VALUES (${Long.MaxValue}L, 'x')").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m =>
      m.toLowerCase.contains("overflow") || m.contains("CAST_OVERFLOW")), s"$e")
    // the failed INSERT committed nothing
    assert(Versioned.currentVersion(spark, dir).contains(1L))
    // LEGACY policy restores the permissive pre-ANSI cast
    spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")
    try {
      spark.sql(s"INSERT INTO $rel VALUES (${Long.MaxValue}L, 'y')").collect()
      assert(Versioned.currentVersion(spark, dir).contains(2L))
    } finally spark.conf.set("spark.sql.storeAssignmentPolicy", "ANSI")
    // in-range values keep inserting under ANSI
    spark.sql(s"INSERT INTO $rel VALUES (7, 'z')")
    assert(Versioned.read(spark, dir).filter("id = 7").count() == 1L)
  }
}
