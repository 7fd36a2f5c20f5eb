package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.table.Versioned

/** `OPTIMIZE t WHERE col = lit` — partition/zone-scoped bin-packing
  * ([[Versioned.compactSmallWhere]] + the DDL): only the slice the
  * predicate selects is rewritten, so steady-state maintenance cost
  * follows the partition being landed into, not the table. The slice
  * resolves from the hive-layout path value or the column's zone maps;
  * an unscoped column refuses loudly (Delta's partition-column
  * restriction).
  */
class OptimizeWhereSpec extends SparkSpec {

  import spark.implicits._

  private def pathId(dir: String): String = s"`graft-versioned`.`$dir`"

  test("hive layout: only the named partition's files compact") {
    val dir = tmpDir("optw_hive")
    Seq(1, 2, 3).flatMap(d => (1 to 12).map(i => (d, d * 100 + i, s"v$d-$i")))
      .toDF("day", "id", "s").repartition(4)
      .write.partitionBy("day").mode(SaveMode.Overwrite).parquet(dir)
    Versioned.convert(spark, dir)                                        // v1
    val before = Versioned.filesAt(spark, dir, 1L)
    val day2 = before.filter(_.startsWith("day=2/")).toSet
    assert(day2.size > 1, "fixture needs a multi-file partition")
    val others = before.filterNot(_.startsWith("day=2/")).toSet
    val v = spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE day = 2").as[Long].head()
    assert(v == 2L)
    val after = Versioned.filesAt(spark, dir, 2L).toSet
    assert(others.subsetOf(after), "other partitions must not be touched")
    assert((after & day2).isEmpty, "day=2's small files must be rewritten")
    assert((after -- others).size == 1, "the slice bin-packs to one file")
    // rows are preserved exactly, partition values included (the
    // rewrite materializes the path-derived column)
    assert(Versioned.read(spark, dir).filter(col("day") === 2)
      .select("id").as[Int].collect().toSet == (201 to 212).toSet)
    assert(Versioned.read(spark, dir).count() == 36L)
    // compacting an already-compact slice is a no-op returning the head
    assert(spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE day = 2")
      .as[Long].head() == 2L)
  }

  test("zone maps: only zone-intersecting files compact") {
    val dir = tmpDir("optw_zone")
    // three appends with disjoint id ranges → three files, zone-mapped
    Seq(0L, 100L, 200L).foreach(off =>
      Versioned.append(
        (1 to 5).map(i => (off + i, s"r${off + i}")).toDF("id", "s")
          .coalesce(1), dir))
    // a second small file whose range contains 103 so the slice has 2
    Versioned.append(Seq((103L, "r103b")).toDF("id", "s"), dir)          // v4
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    val before = Versioned.filesAt(spark, dir, 4L)
    val inSlice = Versioned.prunedFiles(spark, dir, 4L, "id", 103L, 103L).toSet
    assert(inSlice.size == 2 && before.size == 4)
    val v = spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE id = 103").as[Long].head()
    assert(v == 5L)
    val after = Versioned.filesAt(spark, dir, 5L).toSet
    assert((before.toSet -- inSlice).subsetOf(after),
      "files outside the zone slice must not be touched")
    assert((after & inSlice).isEmpty)
    assert(Versioned.read(spark, dir).count() == 16L)
  }

  test("date-typed zone columns translate the WHERE literal through epoch days") {
    val dir = tmpDir("optw_date")
    // three date-disjoint appends + one extra small file on day 2
    Seq("2024-01-01", "2024-01-02", "2024-01-03").foreach(d =>
      Versioned.append(
        (1 to 4).map(i => (java.sql.Date.valueOf(d), s"$d#$i")).toDF("d", "s")
          .coalesce(1), dir))
    Versioned.append(
      Seq((java.sql.Date.valueOf("2024-01-02"), "extra")).toDF("d", "s"), dir) // v4
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("d"))
    val before = Versioned.filesAt(spark, dir, 4L).toSet
    val v = spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE d = '2024-01-02'")
      .as[Long].head()
    assert(v == 5L, "the date slice must compact, not silently no-op")
    val after = Versioned.filesAt(spark, dir, 5L).toSet
    assert((before & after).size == 2, "only day-2's two files rewrite")
    assert(Versioned.read(spark, dir).count() == 13L)
    // a literal that does not parse as a date refuses loudly
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE d = 'not-a-date'")
    }
    assert(e.getMessage.contains("does not parse"))
  }

  test("string-zoned columns slice through the string bounds sidecar") {
    val dir = tmpDir("optw_str")
    Seq("a", "m", "z").foreach(p =>
      Versioned.append(
        (1 to 4).map(i => (s"$p$i", i.toLong)).toDF("k", "n").coalesce(1), dir))
    Versioned.append(Seq(("m3", 99L)).toDF("k", "n"), dir) // v4: second m3-file
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("k"))
    val before = Versioned.filesAt(spark, dir, 4L).toSet
    val v = spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE k = 'm3'").as[Long].head()
    assert(v == 5L, "the string slice must compact via StrZones")
    val after = Versioned.filesAt(spark, dir, 5L).toSet
    assert((before & after).size == 2, "a- and z-files must not be touched")
    assert(Versioned.read(spark, dir).count() == 13L)
  }

  test("unscoped column and WHERE+ZORDER refuse loudly") {
    val dir = tmpDir("optw_refuse")
    Versioned.append((1 to 8).map(i => (i.toLong, s"r$i")).toDF("id", "s"), dir)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE id = 3")
    }
    assert(e.getMessage.contains("zone-mapped"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE ${pathId(dir)} WHERE id = 3 ZORDER BY (id, s)")
    }
    assert(e2.getMessage.contains("zorder_incremental"))
  }
}
