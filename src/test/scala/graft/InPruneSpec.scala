package graft

import org.apache.spark.sql.functions.col

import graft.table.Versioned

/** IN-list file skipping through the DSv2 scan: a pushed
  * `col IN (a, b, c)` prunes the planned file set to the UNION of its
  * per-element point probes across the long-zone, string-zone, and
  * bloom sidecars — the disjunctive complement of the single-point
  * equality path. Lists past the cap degrade to the [min, max] span
  * (orderable domains) instead of going unpruned.
  */
class InPruneSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files, ids range-partitioned (file p holds ids p·25+1 …
    * p·25+25, keys "k-<id>"), so each value lives in exactly one file.
    */
  private def mkTable(prefix: String): String = {
    val dir = tmpDir(prefix)
    (0 to 3).foreach { p =>
      Versioned.append(
        (1L to 25L).map(i => (p * 25L + i, f"k-${p * 25L + i}%03d"))
          .toDF("id", "key").coalesce(1), dir)
    }
    assert(Versioned.filesAt(spark, dir, 4L).size == 4)
    dir
  }

  private def filesOf(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
              p.fileIndex.inputFiles.length
            case s => // runtime-filterable wrapper: live count in the description
              """files=(\d+)""".r.findFirstMatchIn(s.description())
                .map(_.group(1).toInt).getOrElse(Int.MaxValue)
          }
      }).sum

  private def read(dir: String) =
    spark.read.format("graft-versioned").load(dir)

  test("long-zone IN prunes to the union of per-element files") {
    val dir = mkTable("in_zone")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // both elements in ONE file
    val one = read(dir).filter(col("id").isin(30L, 31L))
    assert(filesOf(one) == 1, "two same-file points must plan one file")
    assert(one.select("id").as[Long].collect().sorted.toSeq == Seq(30L, 31L))
    // elements spanning two files: plans exactly their union, NOT the
    // whole [30, 80] span
    val two = read(dir).filter(col("id").isin(30L, 80L))
    assert(filesOf(two) == 2, "two cross-file points must plan two files")
    assert(two.count() == 2L)
    // every element outside every zone: zero files planned, zero rows
    val none = read(dir).filter(col("id").isin(500L, 600L))
    assert(filesOf(none) == 0)
    assert(none.count() == 0L)
  }

  test("the post-OptimizeIn InSet form (long lists) still prunes") {
    val dir = mkTable("in_inset")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // 16 elements > spark.sql.optimizer.inSetConversionThreshold (10):
    // the optimizer rewrites In → InSet before pushdown
    val vals = (30L to 45L).map(java.lang.Long.valueOf)
    val q = read(dir).filter(col("id").isin(vals: _*))
    assert(filesOf(q) == 1, "an InSet within one file must plan one file")
    assert(q.count() == 16L)
  }

  test("string-zone IN prunes and NULL elements drop soundly") {
    val dir = mkTable("in_str")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("key"))
    val q = read(dir).filter(col("key").isin("k-030", "k-031"))
    assert(filesOf(q) == 1, "same-file string points must plan one file")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(30L, 31L))
    // a NULL element never matches a row — it must not disable pruning
    val withNull = read(dir).filter(
      col("key").isin("k-030", null))
    assert(filesOf(withNull) == 1)
    assert(withNull.select("id").as[Long].collect().toSeq == Seq(30L))
  }

  test("bloom IN prunes when no zones exist; union keeps every hit") {
    val dir = mkTable("in_bloom")
    // no zone sidecars — only the bloom can skip
    Versioned.buildBloom(spark, dir, Seq("key"), itemsPerFile = 1000L)
    val q = read(dir).filter(col("key").isin("k-030", "k-080"))
    assert(filesOf(q) == 2, "bloom IN must plan the two containing files")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(30L, 80L))
    // absent values: with 25 keys/file at fpp 1% the fixed probes
    // deterministically rule out everything
    val none = read(dir).filter(col("key").isin("zz-1", "zz-2"))
    assert(filesOf(none) == 0)
    assert(none.count() == 0L)
  }

  test("a list past the cap degrades to span pruning, rows exact") {
    val dir = mkTable("in_cap")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // 300 elements > cap 256, all within files 1-2's [26, 75] span
    val vals = (26L to 325L).map(java.lang.Long.valueOf)
    val q = read(dir).filter(col("id").isin(vals: _*))
    // span [26, 325] intersects files 1, 2, 3 — NOT file 0
    assert(filesOf(q) == 3, "capped list must span-prune to 3 of 4 files")
    assert(q.count() == 75L) // ids 26..100 exist
  }

  test("IN composes with other conjuncts and an unindexed column never prunes") {
    val dir = mkTable("in_conj")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // each conjunct prunes independently: IN keeps the files of 30 and
    // 80, the range keeps files whose hi ≥ 50 — the intersection is 2
    // files (the element-level cross-conjunct contradiction at id=30 is
    // the residual filter's job, not planning's)
    val q = read(dir).filter(col("id").isin(30L, 80L) && col("id") >= 50L)
    assert(filesOf(q) == 2)
    assert(q.select("id").as[Long].collect().toSeq == Seq(80L))
    // IN on a column with no sidecar: full plan, exact rows
    val un = read(dir).filter(col("key").isin("k-030"))
    assert(filesOf(un) == 4)
    assert(un.count() == 1L)
  }

  test("a same-column OR-equality chain prunes like the IN it denotes") {
    val dir = mkTable("in_or")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    val q = read(dir).filter(
      col("id") === 30L || col("id") === 80L || col("id").isin(31L))
    assert(filesOf(q) == 2, "an OR-of-points chain must plan its union")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(30L, 31L, 80L))
    // a disjunct on ANOTHER column poisons the chain: no pruning
    val mixed = read(dir).filter(col("id") === 30L || col("key") === "k-080")
    assert(filesOf(mixed) == 4, "a cross-column OR must never prune")
    assert(mixed.count() == 2L)
    // a non-point disjunct (range) poisons the chain too
    val ranged = read(dir).filter(col("id") === 30L || col("id") > 90L)
    assert(filesOf(ranged) == 4)
    assert(ranged.count() == 11L)
  }

  test("a broadcast join's build-side keys prune fact files at runtime (dynamic file pruning)") {
    val dir = mkTable("in_dfp")
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // selective dim as a REAL file scan: a local relation would fold
    // its filter away and PartitionPruning needs a selective Filter
    // node on the build side to plant the pruning subquery
    val dimDir = tmpDir("in_dfp_dim")
    (1L to 100L).map(i => (i, if (i == 30L) "pick" else "skip"))
      .toDF("d_id", "d_tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("d_tag") === "pick")
    val j = read(dir).join(
      org.apache.spark.sql.functions.broadcast(dim), col("id") === col("d_id"))
    val rows = j.collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(30L))
    val planStr = j.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a planted runtime filter on the fact scan:\n$planStr")
    val live = """GraftRuntimeFilterable\(files=(\d+)""".r
      .findFirstMatchIn(planStr).map(_.group(1).toInt)
    assert(live.isDefined, s"expected a runtime-filterable graft scan:\n$planStr")
    assert(live.get < 4,
      s"runtime filter must prune fact files via the zone index: $live of 4")
  }

  test("a bare IS NOT NULL scan skips all-NULL-sentinel files") {
    val dir = tmpDir("in_nn")
    // file 0: key and v all NULL (the post-mergeSchema backfill shape);
    // files 1-3 carry real values
    (0 to 3).foreach { p =>
      Versioned.append(
        (1L to 25L).map { i =>
          val id = p * 25L + i
          (id,
            if (p == 0) null else f"k-$id%03d",
            if (p == 0) None else Some(id))
        }.toDF("id", "key", "v").coalesce(1), dir)
    }
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("key", "v"))
    // string sentinel
    val qs = read(dir).filter(col("key").isNotNull)
    assert(filesOf(qs) == 3, "all-NULL string file must be skipped")
    assert(qs.count() == 75L)
    // long sentinel
    val ql = read(dir).filter(col("v").isNotNull)
    assert(filesOf(ql) == 3, "all-NULL long file must be skipped")
    assert(ql.count() == 75L)
    // IS NULL is not minable — full plan, exact rows
    val nul = read(dir).filter(col("key").isNull)
    assert(filesOf(nul) == 4)
    assert(nul.count() == 25L)
  }

  test("date and timestamp IN probes prune in the stat domain") {
    val dir = tmpDir("in_ts")
    (0 to 3).foreach { p =>
      Versioned.append(
        (1 to 25).map { i =>
          val d = java.sql.Date.valueOf(java.time.LocalDate
            .of(2026, 1, 1).plusDays(p * 25 + i - 1))
          val t = java.sql.Timestamp.valueOf(
            java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)
              .plusHours(p * 25 + i - 1))
          (p * 25L + i, d, t)
        }.toDF("id", "d", "ts").coalesce(1), dir)
    }
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("d", "ts"))
    val dq = read(dir).filter(col("d").isin(
      java.sql.Date.valueOf("2026-01-30"), java.sql.Date.valueOf("2026-01-31")))
    assert(filesOf(dq) == 1, "date IN within one file must plan one file")
    assert(dq.count() == 2L)
    val tq = read(dir).filter(col("ts").isin(
      java.sql.Timestamp.valueOf("2026-01-02 05:00:00")))
    assert(filesOf(tq) == 1, "timestamp IN must prune via floored seconds")
    assert(tq.count() == 1L)
  }
}
