package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.pipeline.IncrementalAgg
import graft.streaming.Ingest
import graft.table.Versioned

/** Exactly-once writer transactions on the versioned log, and the
  * CDF-maintained aggregate table built on them.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  // --- writer transactions (txnAppId/txnVersion analog) -------------

  test("appendIdempotent refuses an already-seen (app, version) before writing data") {
    val dir = tmpDir("txn_append")
    assert(Versioned.appendIdempotent(
      Seq((1L, "a")).toDF("id", "s"), dir, "app1", 0L).contains(1L))
    // replay of batch 0 and a stale batch both no-op
    assert(Versioned.appendIdempotent(
      Seq((1L, "dup")).toDF("id", "s"), dir, "app1", 0L).isEmpty)
    assert(Versioned.read(spark, dir).count() == 1)
    // next batch commits; an unrelated writer's version space is independent
    assert(Versioned.appendIdempotent(
      Seq((2L, "b")).toDF("id", "s"), dir, "app1", 1L).contains(2L))
    assert(Versioned.appendIdempotent(
      Seq((3L, "c")).toDF("id", "s"), dir, "other", 0L).contains(3L))
    assert(Versioned.read(spark, dir).count() == 3)
    // no orphan data dirs were written by the refused replay
    val dataDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("d-"))
    assert(dataDirs == 3, s"refused commit must not write data files ($dataDirs dirs)")
  }

  test("txn watermarks survive overwrite and compaction commits") {
    val dir = tmpDir("txn_carry")
    Versioned.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), dir, "app", 5L)
    Versioned.overwrite(Seq((2L, "b")).toDF("id", "s"), dir)
    Versioned.compact(spark, dir)
    assert(Versioned.lastTxnVersion(spark, dir, "app").contains(5L),
      "compaction between micro-batches must not reopen the replay window")
    assert(Versioned.appendIdempotent(
      Seq((9L, "replay")).toDF("id", "s"), dir, "app", 5L).isEmpty)
  }

  test("streaming sink replays after a checkpoint wipe without duplicating rows") {
    val src = tmpDir("txn_src")
    val table = tmpDir("txn_table")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "a.csv"),
      "id,s\n1,a\n2,b\n".getBytes)

    def drain(checkpoint: String): Unit =
      Ingest.sinkVersionedExactlyOnce(
        spark.readStream.schema(schema).option("header", "true").csv(src)
          .select(col("id"), col("s")),
        table, "ingest", checkpoint)

    drain(tmpDir("txn_ckpt1"))
    assert(Versioned.read(spark, table).count() == 2)
    // fresh checkpoint: the file source re-lists everything, batchIds
    // restart at 0 — every replayed batch must bounce off the log
    drain(tmpDir("txn_ckpt2"))
    assert(Versioned.read(spark, table).count() == 2,
      "checkpoint-wiped replay duplicated rows")
  }

  // --- CDF-maintained aggregate --------------------------------------

  private def goldRows(dir: String): Set[(String, Long, Long)] =
    Versioned.read(spark, dir).select("k", "n", "sum_v")
      .as[(String, Long, Long)].collect().toSet

  private def expect(silver: String): Set[(String, Long, Long)] =
    IncrementalAgg.recompute(spark, silver, Seq("k"), Seq("v"))
      .as[(String, Long, Long)].collect().toSet

  test("refresh tracks appends, upserts, and key retirement exactly") {
    val silver = tmpDir("cdf_silver")
    val gold = tmpDir("cdf_gold")
    def assertCurrent(): Unit = assert(goldRows(gold) == expect(silver))

    // v1: initial load → full compute path
    Versioned.append(Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("k", "v"), silver)
    assert(IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v")).contains(1L))
    assertCurrent()

    // v2: append only → incremental path over the append's rows
    Versioned.append(Seq(("b", 1L), ("c", 2L)).toDF("k", "v"), silver)
    assert(IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v")).isDefined)
    assertCurrent()

    // v3: overwrite that updates a, retires b entirely, keeps c
    Versioned.overwrite(Seq(("a", 100L), ("c", 2L)).toDF("k", "v"), silver)
    IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v"))
    assertCurrent()
    assert(!goldRows(gold).exists(_._1 == "b"), "zero-count key must vanish")

    // no new silver commits → refresh is a no-op, gold version unchanged
    val vBefore = Versioned.currentVersion(spark, gold)
    assert(IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v")).isEmpty)
    assert(Versioned.currentVersion(spark, gold) == vBefore)
  }

  test("min/max maintain under append-only windows, recompute under retractions") {
    val silver = tmpDir("cdf_mm_s")
    val gold = tmpDir("cdf_mm_g")
    def rows(): Set[(String, Long, Long, Long, Long)] =
      Versioned.read(spark, gold).select("k", "n", "sum_v", "min_v", "max_v")
        .as[(String, Long, Long, Long, Long)].collect().toSet
    def want(): Set[(String, Long, Long, Long, Long)] =
      IncrementalAgg.recompute(spark, silver, Seq("k"), Seq("v"), Seq("v"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
    def refresh() = IncrementalAgg.refresh(
      spark, silver, gold, Seq("k"), Seq("v"), Seq("v"))

    // bootstrap
    Versioned.append(Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("k", "v"), silver)
    assert(refresh().contains(1L))
    assert(rows() == want())
    assert(rows().find(_._1 == "a").get == (("a", 2L, 15L, 5L, 10L)))

    // append-only window: maintained monotonically from added files
    // (a new extreme AND a non-extreme both land correctly)
    Versioned.append(Seq(("a", 20L), ("a", 7L), ("c", 3L)).toDF("k", "v"), silver)
    assert(refresh().isDefined)
    assert(rows() == want())
    assert(rows().find(_._1 == "a").get == (("a", 4L, 42L, 5L, 20L)))

    // retraction window: the departed row WAS a's max — maintained
    // min/max cannot know the runner-up, so the refresh recomputes
    Versioned.deleteWhere(spark, silver, col("v") === 20L)
    assert(refresh().isDefined)
    assert(rows() == want())
    assert(rows().find(_._1 == "a").get == (("a", 3L, 22L, 5L, 10L)),
      "the new max must be the runner-up, not the deleted extreme")
  }

  test("a crashed refresh leaves the watermark untouched; rerun converges") {
    val silver = tmpDir("cdf_crash_s")
    val gold = tmpDir("cdf_crash_g")
    Versioned.append(Seq(("a", 1L)).toDF("k", "v"), silver)
    IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v"))
    Versioned.append(Seq(("a", 2L)).toDF("k", "v"), silver)
    // simulate a refresh that computed but died before commit: nothing
    // to do — the watermark only moves inside the commit itself. The
    // next run replays the same window.
    IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v"))
    assert(goldRows(gold) == expect(silver))
  }

  test("silver vacuumed past the watermark falls back to full recompute") {
    val silver = tmpDir("cdf_vac_s")
    val gold = tmpDir("cdf_vac_g")
    Versioned.append(Seq(("a", 1L)).toDF("k", "v"), silver)
    IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v"))
    Versioned.append(Seq(("b", 2L)).toDF("k", "v"), silver)
    Versioned.append(Seq(("c", 3L)).toDF("k", "v"), silver)
    Versioned.vacuum(spark, silver, keepVersions = 1) // drops v1, the watermark
    IncrementalAgg.refresh(spark, silver, gold, Seq("k"), Seq("v"))
    assert(goldRows(gold) == expect(silver))
  }
}
