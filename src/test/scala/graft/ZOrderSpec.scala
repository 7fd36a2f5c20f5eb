package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** [[Versioned.optimizeZOrderBy]] — interleaved-bit multi-column
  * clustering. The contract that distinguishes it from
  * [[Versioned.optimizeClusterBy]] (lexicographic): after Z-ordering
  * on (a, b), a bounded range on b ALONE prunes files — under a
  * lexicographic sort on (a, b) every file spans b's whole domain and
  * nothing prunes.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  // a 2-d grid: both columns uniform, independent — the classic
  // z-order fixture (lexicographic locality exists only on `a`)
  private def grid(dir: String): Unit = {
    val rows = for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong, a * 64L + b)
    // 8 interleaved appends so pre-optimize files span both domains
    rows.grouped(512).foreach { g =>
      Versioned.append(g.toDF("a", "b", "payload").coalesce(1), dir)
    }
  }

  test("rows are unchanged; commit is an optimize") {
    val dir = tmpDir("zo_rows")
    grid(dir)
    val before = Versioned.read(spark, dir).as[(Long, Long, Long)].collect().toSet
    val v = Versioned.optimizeZOrderBy(spark, dir, Seq("a", "b"), targetFiles = 16)
    assert(Versioned.opAt(spark, dir, v) == "optimize")
    val after = Versioned.read(spark, dir).as[(Long, Long, Long)].collect().toSet
    assert(after == before)
  }

  test("both columns prune after z-order; the trailing column prunes where lexicographic cannot") {
    val dirZ = tmpDir("zo_prune_z")
    val dirL = tmpDir("zo_prune_lex")
    grid(dirZ); grid(dirL)
    val vZ = Versioned.optimizeZOrderBy(spark, dirZ, Seq("a", "b"), targetFiles = 16)
    val vL = Versioned.optimizeClusterBy(spark, dirL, Seq("a", "b"), targetFiles = 16)
    val nZ = Versioned.filesAt(spark, dirZ, vZ).size
    val nL = Versioned.filesAt(spark, dirL, vL).size
    // leading column: both layouts prune
    assert(Versioned.prunedFiles(spark, dirZ, vZ, "a", 0L, 7L).size < nZ)
    assert(Versioned.prunedFiles(spark, dirL, vL, "a", 0L, 7L).size < nL)
    // trailing column: only the z-ordered layout prunes
    val zB = Versioned.prunedFiles(spark, dirZ, vZ, "b", 0L, 7L).size
    val lexB = Versioned.prunedFiles(spark, dirL, vL, "b", 0L, 7L).size
    assert(zB < nZ, s"z-order failed to prune on b: $zB of $nZ")
    assert(lexB == nL,
      s"fixture broken: lexicographic pruned on b ($lexB of $nL) — grid not uniform?")
    // and the pruned read returns exactly the right rows
    val got = Versioned.readWhere(spark, dirZ, vZ, "b", 0L, 7L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (for { a <- 0 until 64; b <- 0 until 8 }
      yield (a.toLong, b.toLong, a * 64L + b)).toSet)
  }

  test("skewed columns still bucket (quantile boundaries, not min/max scaling)") {
    val dir = tmpDir("zo_skew")
    // a is power-law-ish: 90% of rows in [0, 9], outliers to 1e12
    val rows = (0 until 4096).map { i =>
      val a = if (i % 10 == 9) 1000000000000L + i else (i % 10).toLong
      (a, (i % 64).toLong, i.toLong)
    }
    rows.grouped(512).foreach(g => Versioned.append(g.toDF("a", "b", "p").coalesce(1), dir))
    val v = Versioned.optimizeZOrderBy(spark, dir, Seq("a", "b"), targetFiles = 16)
    val n = Versioned.filesAt(spark, dir, v).size
    // the dense region [0, 9] must not collapse into one bucket: a
    // range over part of it still prunes
    assert(Versioned.prunedFiles(spark, dir, v, "b", 0L, 7L).size < n)
    assert(Versioned.read(spark, dir).count() == 4096L)
  }

  test("date and decimal columns z-order through their stat domains") {
    val dir = tmpDir("zo_types")
    val df = (0 until 1024).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(i % 64)),
        BigDecimal(i % 64), i.toLong)
    }.toDF("d", "m", "p")
      .withColumn("m", (col("m") / 100).cast("decimal(10,2)"))
    Versioned.append(df.coalesce(4), dir)
    val v = Versioned.optimizeZOrderBy(spark, dir, Seq("d", "m"), targetFiles = 8)
    assert(Versioned.read(spark, dir).count() == 1024L)
    // epoch-day range on d prunes
    val lo = java.time.LocalDate.of(2026, 1, 1).toEpochDay
    assert(Versioned.prunedFiles(spark, dir, v, "d", lo, lo + 7).size <
      Versioned.filesAt(spark, dir, v).size)
  }

  test("incremental z-order rewrites only the unclustered tail") {
    val dir = tmpDir("zo_incr")
    grid(dir)
    // full clustering pass first
    val v1 = Versioned.optimizeZOrderBy(spark, dir, Seq("a", "b"), targetFiles = 16)
    val clusteredFiles = Versioned.filesAt(spark, dir, v1).toSet
    // nothing new → no-op
    assert(Versioned.zorderIncremental(spark, dir, Seq("a", "b")).isEmpty)
    // new unclustered appends land
    (0 until 4).foreach { i =>
      Versioned.append((0 until 256).map(j =>
        (100L + j % 64, (j / 4).toLong, 10000L + i * 256 + j))
        .toDF("a", "b", "payload").coalesce(1), dir)
    }
    val before = Versioned.read(spark, dir).as[(Long, Long, Long)].collect().toSet
    val v2 = Versioned.zorderIncremental(spark, dir, Seq("a", "b"), targetFiles = 4).get
    // every file of the FULL pass survives untouched; only the tail moved
    val after = Versioned.filesAt(spark, dir, v2).toSet
    assert(clusteredFiles.subsetOf(after),
      "incremental run rewrote already-clustered files")
    assert((after -- clusteredFiles).size == 4) // the fresh tail files
    assert(Versioned.read(spark, dir).as[(Long, Long, Long)].collect().toSet == before)
    // a second run has nothing left to do
    assert(Versioned.zorderIncremental(spark, dir, Seq("a", "b")).isEmpty)
    // and the tail files are pruned on b like the base
    assert(Versioned.prunedFiles(spark, dir, v2, "b", 0L, 7L).size < after.size)
  }

  test("incremental z-order provenance resolves in O(checkpoint) log reads") {
    val dir = tmpDir("zo_prov")
    grid(dir)
    Versioned.optimizeZOrderBy(spark, dir, Seq("a", "b"), targetFiles = 8)
    val clusteredAfterFull = Versioned.filesAt(
      spark, dir, Versioned.currentVersion(spark, dir).get).toSet
    // push the optimize commit far behind the head — PAST several
    // checkpoint boundaries — with a long run of small appends (the
    // streamed-bronze shape); the old derivation re-read EVERY one of
    // these entries per incremental run
    val nAppends = (Versioned.CheckpointInterval * 3 + 5).toInt
    (0 until nAppends).foreach { i =>
      Versioned.append(Seq((200L + i, 1L, 90000L + i)).toDF("a", "b", "payload")
        .coalesce(1), dir)
    }
    val r0 = Versioned.logReads.get()
    val v = Versioned.zorderIncremental(spark, dir, Seq("a", "b"), targetFiles = 2).get
    val reads = Versioned.logReads.get() - r0
    // budget: provenance walk-back (≤ interval) + filesAt resolutions
    // for the rewrite/commit/zone-carry machinery (each ≤ interval) —
    // far below the ~70 entries the head now has. The old code alone
    // burned nAppends+ reads before any rewrite work.
    assert(reads <= Versioned.CheckpointInterval * 6,
      s"incremental z-order opened $reads log entries — provenance is " +
        "not resolving from checkpoint entries")
    // correctness unchanged: the full pass's files survive, appends moved
    val after = Versioned.filesAt(spark, dir, v).toSet
    assert(clusteredAfterFull.subsetOf(after))
    assert((after -- clusteredAfterFull).size == 2)
    // the NEXT incremental run sees the fresh files as clustered via the
    // recorded provenance too: nothing left to do
    assert(Versioned.zorderIncremental(spark, dir, Seq("a", "b")).isEmpty)
  }

  test("non-zoneable and absent columns are refused") {
    val dir = tmpDir("zo_bad")
    Versioned.append(Seq((1L, "s")).toDF("a", "s"), dir)
    intercept[IllegalArgumentException] {
      Versioned.optimizeZOrderBy(spark, dir, Seq("a", "s"))
    }
    intercept[IllegalArgumentException] {
      Versioned.optimizeZOrderBy(spark, dir, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Versioned.optimizeZOrderBy(spark, dir, Seq("a", "a", "a", "a", "a"))
    }
  }
}
