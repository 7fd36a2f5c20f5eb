package graft

import graft.ops.Upsert
import graft.ops.Upsert.{scol, MergeClause}
import graft.table.Versioned
import org.apache.spark.sql.functions._

/** MERGE WITH SCHEMA EVOLUTION (Delta's `withSchemaEvolution`):
  * source-only columns append to the committed schema in the SAME
  * commit as the merged rows — kept files surface NULL there (the
  * mergeSchema read contract), prior versions time-travel under their
  * own schema, and retypes stay refused evolution or not.
  */
class MergeEvolveSpec extends SparkSpec {

  import spark.implicits._

  private def base(dir: String): Unit =
    Versioned.append(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name"), dir)

  test("source-only columns evolve into the schema; untouched rows read NULL") {
    val dir = tmpDir("mev_basic")
    base(dir)
    val src = Seq((2L, "B", 99L), (4L, "d", 40L)).toDF("k", "name", "score")
    Versioned.mergeFull(spark, dir, src, Seq("k"),
      matched = Seq(MergeClause.Update(None,
        Map("name" -> scol("name"), "score" -> scol("score")))),
      evolveSchema = true)
    val out = Versioned.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "name", "score"))
    val got = out.as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, "a", None),       // untouched file: NULL in the new column
      (2L, "B", Some(99L)),  // updated: takes the source's score
      (3L, "c", None),       // carried row of a touched file
      (4L, "d", Some(40L)))) // inserted whole source row
    // the pre-merge version still time-travels under ITS schema
    assert(Versioned.readAt(spark, dir, 1L).columns.toSeq == Seq("k", "name"))
  }

  test("without the flag a wider source is refused with the flag named") {
    val dir = tmpDir("mev_refuse")
    base(dir)
    val src = Seq((2L, "B", 99L)).toDF("k", "name", "score")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeFull(spark, dir, src, Seq("k"))
    }
    assert(e.getMessage.contains("evolveSchema"), e.getMessage)
  }

  test("a NARROW source pads target-only columns with NULLs under evolution") {
    val dir = tmpDir("mev_narrow")
    Versioned.append(Seq((1L, "a", 5L)).toDF("k", "name", "ver"), dir)
    val src = Seq((2L, "b")).toDF("k", "name")
    Versioned.mergeFull(spark, dir, src, Seq("k"), evolveSchema = true)
    val got = Versioned.read(spark, dir)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set((1L, "a", Some(5L)), (2L, "b", None)))
  }

  test("retypes are refused, evolution or not") {
    val dir = tmpDir("mev_retype")
    base(dir)
    val src = Seq((2L, 7L)).toDF("k", "name") // name LONG vs table STRING
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeFull(spark, dir, src, Seq("k"), evolveSchema = true)
    }
    assert(e.getMessage.contains("retype"), e.getMessage)
  }

  test("re-adding a DROPPED column via merge evolution is refused") {
    val dir = tmpDir("mev_dropped")
    Versioned.append(Seq((1L, "a", 9L)).toDF("k", "name", "old"), dir)
    Versioned.dropColumn(spark, dir, "old")
    // the drop leaves a column MAPPING (physical names pinned) — merge
    // evolution refuses mapped tables outright, which also covers the
    // resurrected-name hazard
    val src = Seq((2L, "b", 1L)).toDF("k", "name", "old")
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeFull(spark, dir, src, Seq("k"), evolveSchema = true)
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
  }

  test("SQL: MERGE WITH SCHEMA EVOLUTION widens through the statement form") {
    val dir = tmpDir("mev_sql")
    base(dir)
    Seq((2L, "B", 99L), (4L, "d", 40L)).toDF("k", "name", "score")
      .createOrReplaceTempView("mev_src")
    val v = spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO `graft-versioned`.`$dir` t
         |USING mev_src s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .head().getLong(0)
    assert(v == 2L)
    val got = Versioned.read(spark, dir)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some(99L)),
      (3L, "c", None), (4L, "d", Some(40L))))
    // and WITHOUT the clause the same statement still refuses
    val dir2 = tmpDir("mev_sql2")
    base(dir2)
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO `graft-versioned`.`$dir2` t
           |USING mev_src s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    assert(e.getMessage.contains("evolveSchema") ||
      e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
  }

  test("the change feed pairs updates across the evolving commit") {
    val dir = tmpDir("mev_cdf")
    base(dir)
    val src = Seq((2L, "B", 99L)).toDF("k", "name", "score")
    Versioned.mergeFull(spark, dir, src, Seq("k"),
      matched = Seq(MergeClause.Update(None,
        Map("name" -> scol("name"), "score" -> scol("score")))),
      notMatched = Nil, evolveSchema = true)
    val feed = Versioned.changesWithType(spark, dir, 1L, 2L)
      .select("k", "name", "_change_type")
      .as[(Long, String, String)].collect().toSet
    // the touched file's carried rows cancel; row 2 pairs pre/post
    assert(feed == Set(
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage")))
  }

  test("evolution resolves names case-insensitively — no case-duplicate schema") {
    val dir = tmpDir("mev_case")
    base(dir)
    // "NAME" differs from the table's "name" only in case: Spark
    // analysis is case-insensitive, so it is the SAME column — treating
    // it as new would publish a schema with both spellings (ambiguous
    // on every later read). Only "score" is genuinely new.
    val src = Seq((2L, "B", 7L)).toDF("k", "NAME", "score")
    Versioned.mergeFull(spark, dir, src, Seq("k"),
      matched = Seq(MergeClause.Update(None, Map.empty)), // SET *
      notMatched = Nil,
      evolveSchema = true)
    val out = Versioned.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "name", "score"),
      "case-differing source column must resolve to the table's, not duplicate it")
    val got = out.as[(Long, String, Option[Long])].collect().toSet
    // the case-differing column's VALUE lands (not nulled by misalignment)
    assert(got == Set((1L, "a", None), (2L, "B", Some(7L)), (3L, "c", None)))
  }
}
