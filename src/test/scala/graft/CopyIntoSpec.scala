package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** `COPY INTO` — Databricks' idempotent bulk-load statement
  * (`Versioned.copyInto` + the `GraftSqlParser` spelling): file-level
  * load tracking in the commit log (identity = path + length), so
  * re-running the statement loads exactly the files not yet in the
  * table; `COPY_OPTIONS ('force' = 'true')` reloads regardless; text
  * formats read under the TABLE's schema; parquet aligns by name and
  * casts; both directions of column mismatch refuse loudly.
  */
class CopyIntoSpec extends SparkSpec {

  import spark.implicits._

  private def pathId(dir: String): String = s"`graft-versioned`.`$dir`"

  private def landFiles(dir: String, parts: (Int, Range)*): Unit =
    parts.foreach { case (p, r) =>
      r.map(i => (i.toLong, s"s$i")).toDF("id", "s")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/f$p")
      // flatten the single part file up into the landing dir
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/f$p"))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/load$p.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/f$p"), true)
    }

  test("COPY INTO loads once, re-run is a no-op, new files load incrementally") {
    val tbl = tmpDir("copy_tbl")
    val land = tmpDir("copy_land")
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), tbl) // v1: target exists
    landFiles(land, 1 -> (1 to 3), 2 -> (4 to 5))
    val r1 = spark.sql(
      s"COPY INTO ${pathId(tbl)} FROM '$land' FILEFORMAT = PARQUET")
      .as[(Long, Long)].head()
    assert(r1 == ((2L, 2L))) // v2, two files loaded
    assert(Versioned.read(spark, tbl).count() == 6L)
    // idempotent: same statement again loads nothing, head unchanged
    val r2 = spark.sql(
      s"COPY INTO ${pathId(tbl)} FROM '$land' FILEFORMAT = PARQUET")
      .as[(Long, Long)].head()
    assert(r2 == ((2L, 0L)))
    assert(Versioned.read(spark, tbl).count() == 6L)
    // a new landing file loads alone
    landFiles(land, 3 -> (6 to 9))
    val r3 = spark.sql(
      s"COPY INTO ${pathId(tbl)} FROM '$land' FILEFORMAT = PARQUET")
      .as[(Long, Long)].head()
    assert(r3 == ((3L, 1L)))
    assert(Versioned.read(spark, tbl).as[(Long, String)].collect().toSet ==
      ((0 to 9).map(i => (i.toLong, if (i == 0) "seed" else s"s$i")).toSet))
    // the loading commits are ordinary appends — streaming/CDF class
    assert(Versioned.opAt(spark, tbl, 2L) == "append")
    assert(Versioned.isAppendOnlyWindow(spark, tbl, 1L, 3L))
  }

  test("COPY_OPTIONS force reloads already-loaded files") {
    val tbl = tmpDir("copy_force_tbl")
    val land = tmpDir("copy_force_land")
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), tbl)
    landFiles(land, 1 -> (1 to 2))
    spark.sql(s"COPY INTO ${pathId(tbl)} FROM '$land' FILEFORMAT = PARQUET").collect()
    val r = spark.sql(s"COPY INTO ${pathId(tbl)} FROM '$land' " +
      "FILEFORMAT = PARQUET COPY_OPTIONS ('force' = 'true')")
      .as[(Long, Long)].head()
    assert(r == ((3L, 1L)))
    assert(Versioned.read(spark, tbl).count() == 5L) // duplicated rows, by request
  }

  test("CSV loads under the table's schema with FORMAT_OPTIONS") {
    val tbl = tmpDir("copy_csv_tbl")
    val land = tmpDir("copy_csv_land")
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), tbl)
    val fs = new org.apache.hadoop.fs.Path(land)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(land))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$land/a.csv"), true)
    out.write("id,s\n1,x\n2,y\n".getBytes("UTF-8")); out.close()
    val r = spark.sql(s"COPY INTO ${pathId(tbl)} FROM '$land' " +
      "FILEFORMAT = CSV FORMAT_OPTIONS ('header' = 'true')")
      .as[(Long, Long)].head()
    assert(r == ((2L, 1L)))
    assert(Versioned.read(spark, tbl).as[(Long, String)].collect().toSet ==
      Set((0L, "seed"), (1L, "x"), (2L, "y")))
  }

  test("parquet aligns by name case-insensitively and casts; mismatches refuse") {
    val tbl = tmpDir("copy_align_tbl")
    val land = tmpDir("copy_align_land")
    Versioned.append(Seq((0L, "seed")).toDF("id", "s"), tbl)
    // reversed column order, different case, int instead of long
    Seq(("x", 1), ("y", 2)).toDF("S", "ID")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/ok")
    spark.sql(s"COPY INTO ${pathId(tbl)} FROM '$land/ok' FILEFORMAT = PARQUET")
      .collect()
    assert(Versioned.read(spark, tbl).as[(Long, String)].collect().toSet ==
      Set((0L, "seed"), (1L, "x"), (2L, "y")))
    // source-only column refuses
    Seq((3L, "z", true)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/extra")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(
        s"COPY INTO ${pathId(tbl)} FROM '$land/extra' FILEFORMAT = PARQUET")
        .collect()
    }
    assert(e1.getMessage.contains("extra"))
    // missing target column refuses
    Seq(Tuple1(4L)).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/narrow")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"COPY INTO ${pathId(tbl)} FROM '$land/narrow' FILEFORMAT = PARQUET")
        .collect()
    }
    assert(e2.getMessage.contains("lacks target column"))
    // refusals committed nothing
    assert(Versioned.read(spark, tbl).count() == 3L)
  }

  test("CHECK constraints gate COPY INTO like any append") {
    val tbl = tmpDir("copy_cons_tbl")
    val land = tmpDir("copy_cons_land")
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), tbl)
    Versioned.addConstraint(spark, tbl, "pos", "id > 0")
    Seq((-5L, "bad")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$land/bad")
    val e = intercept[Exception] {
      spark.sql(s"COPY INTO ${pathId(tbl)} FROM '$land/bad' FILEFORMAT = PARQUET")
        .collect()
    }
    assert(e.getMessage.contains("pos"))
    assert(Versioned.read(spark, tbl).count() == 1L)
  }

  test("non-table target and unsupported grammar refuse loudly") {
    val e1 = intercept[Exception] {
      spark.sql(s"COPY INTO ${pathId(tmpDir("copy_nope"))} " +
        "FROM '/nowhere' FILEFORMAT = PARQUET").collect()
    }
    assert(e1.getMessage.contains("not a versioned table"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("COPY INTO t FROM somewhere FILEFORMAT = AVRO")
    }
    assert(e2.getMessage.contains("supported grammar"))
  }
}
