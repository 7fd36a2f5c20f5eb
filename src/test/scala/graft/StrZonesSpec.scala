package graft

import org.apache.spark.sql.functions.col

import graft.table.{StrZones, Versioned}

/** String zone maps — truncated per-file min/max bounds for STRING
  * columns (the Iceberg truncate(32) / Delta string-stats analog):
  * range and equality predicates on string keys prune files from the
  * log, with bounds that stay O(32 chars) per file even on document
  * columns. Pruning is sound in CODE-POINT order (what Spark's
  * UTF8String comparison implements), truncated maxima are
  * incremented, all-NULL files carry a skip-exact sentinel, and
  * unstatted files never skip.
  */
class StrZonesSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files with disjoint zero-padded key ranges. */
  private def mkTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    (0 to 3).foreach { p =>
      Versioned.append(
        (1L to 25L).map(i => (p * 25L + i, f"k-${p * 25L + i}%06d"))
          .toDF("id", "key").coalesce(1), dir)
    }
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("key"))
    dir
  }

  test("equality and range probes prune to a strict file subset, rows exact") {
    val dir = mkTable("sz_basic")
    val all = Versioned.filesAt(spark, dir, 4L)
    val one = Versioned.strPrunedFiles(
      spark, dir, 4L, "key", Some("k-000030"), Some("k-000030"))
    assert(one.size == 1, s"single-file key must prune to one file: $one")
    val range = Versioned.strPrunedFiles(
      spark, dir, 4L, "key", Some("k-000040"), Some("k-000060"))
    assert(range.size == 2 && range.size < all.size)
    val rows = Versioned.readWhereStr(
      spark, dir, 4L, "key", Some("k-000040"), Some("k-000060"))
    assert(rows.count() == 21)
    assert(rows.agg(org.apache.spark.sql.functions.min("id")).head().getLong(0) == 40L)
    // absent range: zero files, zero rows
    assert(Versioned.strPrunedFiles(
      spark, dir, 4L, "key", Some("z"), None).isEmpty)
    assert(Versioned.readWhereStr(spark, dir, 4L, "key", Some("z"), None)
      .count() == 0L)
  }

  test("the DSv2 scan prunes string predicates from the pushed filters") {
    val dir = mkTable("sz_dsv2")
    def paths(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      """InMemoryFileIndex\((\d+) paths\)""".r.findFirstMatchIn(p)
        .map(_.group(1).toInt).getOrElse(
          fail(s"no file index in plan:\n$p"))
    }
    val ds = spark.read.format("graft-versioned").load(dir)
    assert(paths(ds.filter(col("key") === "k-000030")) == 1)
    assert(paths(ds.filter(col("key") >= "k-000040" && col("key") <= "k-000060")) == 2)
    assert(paths(ds.filter(col("key").startsWith("k-0000"))) == 4)
    assert(paths(ds.filter(col("key").startsWith("k-00009"))) == 1)
    assert(ds.filter(col("key") === "k-000030").count() == 1L)
    assert(ds.filter(col("key") >= "k-000040" && col("key") <= "k-000060")
      .count() == 21L)
    assert(ds.filter(col("key").startsWith("k-00009")).count() == 10L)
  }

  test("bounds truncate at 32 code points; incremented maxima stay sound") {
    val dir = tmpDir("sz_trunc")
    // two files of LONG strings sharing a 40-char prefix — the 32-cp
    // truncation makes their bounds equal prefixes, so pruning must
    // keep both for any probe inside the shared prefix
    val pad = "x" * 40
    Versioned.append(Seq((1L, pad + "aaa"), (2L, pad + "bbb"))
      .toDF("id", "key").coalesce(1), dir)
    Versioned.append(Seq((3L, pad + "yyy"), (4L, pad + "zzz"))
      .toDF("id", "key").coalesce(1), dir)
    Versioned.writeZoneMaps(spark, dir, 2L, Seq("key"))
    val both = Versioned.strPrunedFiles(
      spark, dir, 2L, "key", Some(pad + "ab"), Some(pad + "ab"))
    assert(both.size == 2, "truncated bounds must keep every candidate")
    // a probe BELOW the shared prefix prunes everything
    assert(Versioned.strPrunedFiles(
      spark, dir, 2L, "key", None, Some("w")).isEmpty)
    // rows stay exact through the residual predicate
    assert(Versioned.readWhereStr(
      spark, dir, 2L, "key", Some(pad + "ab"), Some(pad + "ab")).count() == 0L)
    assert(Versioned.readWhereStr(
      spark, dir, 2L, "key", Some(pad + "aaa"), Some(pad + "aaa")).count() == 1L)
  }

  test("increment carries past ceiling code points; unincrementable = unbounded") {
    assert(StrZones.increment("ab").contains("ac"))
    assert(StrZones.increment("a퟿").contains("a"))
    val top = new String(Character.toChars(0x10FFFF))
    assert(StrZones.increment("a" + top).contains("b"))
    assert(StrZones.increment(top * 3).isEmpty)
    // code-point order, not UTF-16 order: U+10000 (surrogate pair)
    // sorts ABOVE U+E000 for Spark; cpCompare must agree
    val supp = new String(Character.toChars(0x10000))
    assert(StrZones.cpCompare(supp, "") > 0)
    assert(supp.compareTo("") < 0, "UTF-16 order differs — the trap")
  }

  test("all-NULL files skip exactly; files without stats never skip") {
    val dir = tmpDir("sz_null")
    Versioned.append(Seq[(Long, String)]((1L, null), (2L, null))
      .toDF("id", "key").coalesce(1), dir)
    Versioned.append(Seq((3L, "m"), (4L, "n")).toDF("id", "key").coalesce(1), dir)
    Versioned.writeZoneMaps(spark, dir, 2L, Seq("key"))
    // the all-NULL file is skipped on any bounded probe
    assert(Versioned.strPrunedFiles(spark, dir, 2L, "key", Some("a"), None)
      .size == 1)
    // a file appended AFTER the stat pass has no bounds — never skipped
    Versioned.append(Seq((5L, "zz")).toDF("id", "key").coalesce(1), dir)
    val pruned = Versioned.strPrunedFiles(
      spark, dir, 3L, "key", Some("zz"), Some("zz"))
    assert(pruned.size == 1 || pruned.size == 2,
      s"fresh file must stay IN: $pruned")
    assert(Versioned.readWhereStr(spark, dir, 3L, "key", Some("zz"), Some("zz"))
      .count() == 1L)
  }

  test("string bounds carry across appends, deletes, and renames") {
    val dir = mkTable("sz_carry")
    // append: carried + fresh statted (self-heal discipline)
    Versioned.append((101L to 110L).map(i => (i, f"k-${i}%06d"))
      .toDF("id", "key").coalesce(1), dir)
    assert(Versioned.strPrunedFiles(
      spark, dir, 5L, "key", Some("k-000030"), Some("k-000030")).size == 1)
    // copy-on-write delete: kept files keep bounds, rewritten re-stat
    Versioned.deleteWhere(spark, dir, col("id") === 50L)
    assert(Versioned.strPrunedFiles(
      spark, dir, 6L, "key", Some("k-000030"), Some("k-000030")).size == 1)
    // rename: physical-keyed blocks survive with zero re-statting
    Versioned.renameColumn(spark, dir, "key", "key2")
    assert(Versioned.strPrunedFiles(
      spark, dir, 7L, "key2", Some("k-000030"), Some("k-000030")).size == 1)
    assert(Versioned.readWhereStr(
      spark, dir, 7L, "key2", Some("k-000030"), Some("k-000030")).count() == 1L)
  }

  test("OPTIMIZE clusters string keys; bounds sharpen to per-file ranges") {
    val dir = tmpDir("sz_cluster")
    val rnd = new scala.util.Random(7)
    // interleaved keys: before clustering every file spans the range
    (0 to 3).foreach { _ =>
      Versioned.append(
        (0 until 25).map { _ =>
          val k = rnd.nextInt(100000)
          (k.toLong, f"k-$k%06d")
        }.toDF("id", "key").coalesce(1), dir)
    }
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("key"))
    val probe = Versioned.read(spark, dir).select("key")
      .orderBy("key").head().getString(0)
    val before = Versioned.strPrunedFiles(
      spark, dir, 4L, "key", Some(probe), Some(probe)).size
    // the CLUSTER BY declaration accepts string columns
    Versioned.setProperties(spark, dir,
      Map(Versioned.ClusterByKey -> "key"))
    val nv = Versioned.optimizeClusterBy(spark, dir, Seq("key"),
      targetFiles = 4)
    val after = Versioned.strPrunedFiles(
      spark, dir, nv, "key", Some(probe), Some(probe))
    assert(after.size == 1 && after.size <= before,
      s"clustering must sharpen string pruning: $before -> ${after.size}")
    assert(Versioned.readAt(spark, dir, nv).count() == 100L)
    assert(Versioned.readWhereStr(
      spark, dir, nv, "key", Some(probe), Some(probe)).count() >= 1L)
  }

  test("sidecar JSON survives hostile content (quotes, newlines, unicode)") {
    val dir = tmpDir("sz_hostile")
    Versioned.append(Seq((1L, "a\"b\\c"), (2L, "x\ny,{}[]"))
      .toDF("id", "key").coalesce(1), dir)
    Versioned.append(Seq((3L, "日本語テキスト"), (4L, "émoji🎈"))
      .toDF("id", "key").coalesce(1), dir)
    Versioned.writeZoneMaps(spark, dir, 2L, Seq("key"))
    assert(Versioned.readWhereStr(
      spark, dir, 2L, "key", Some("a\"b\\c"), Some("a\"b\\c")).count() == 1L)
    assert(Versioned.readWhereStr(
      spark, dir, 2L, "key", Some("日"), None).count() == 1L)
    val pruned = Versioned.strPrunedFiles(spark, dir, 2L, "key", Some("日"), None)
    assert(pruned.size == 1, s"ascii-bounded file must prune: $pruned")
  }
}
