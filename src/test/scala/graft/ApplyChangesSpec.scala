package graft

import org.apache.spark.sql.functions.col

import graft.ops.ApplyChanges
import graft.table.Versioned

/** APPLY CHANGES INTO (the DLT CDC-apply analog): a change feed with a
  * sequence column materializes as SCD1 (latest state per key) or SCD2
  * (full history with __START_AT/__END_AT validity intervals). Replays
  * and out-of-order stragglers at-or-before the applied state are
  * no-ops — apply is monotone in the sequence.
  */
class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (Long, String, Long, String)*) =
    rows.toDF("id", "name", "seq", "op")

  private def scd1State(dir: String): Set[(Long, String, Long)] =
    Versioned.read(spark, dir).select("id", "name", "seq")
      .as[(Long, String, Long)].collect().toSet

  test("SCD1: creation, upsert, delete, and replay are all sequence-monotone") {
    val dir = tmpDir("ac1")
    // batch 1 creates the table
    ApplyChanges.scd1(spark, dir, feed(
      (1L, "a1", 10L, "I"), (2L, "b1", 10L, "I")),
      Seq("id"), "seq",
      deleteWhen = Some(col("op") === "D"), exceptColumns = Seq("op"))
    assert(scd1State(dir) == Set((1L, "a1", 10L), (2L, "b1", 10L)))
    // batch 2: update 1, delete 2, insert 3
    val b2 = feed((1L, "a2", 20L, "U"), (2L, "b1", 20L, "D"), (3L, "c1", 20L, "I"))
    ApplyChanges.scd1(spark, dir, b2, Seq("id"), "seq",
      Some(col("op") === "D"), Seq("op"))
    assert(scd1State(dir) == Set((1L, "a2", 20L), (3L, "c1", 20L)))
    // replaying batch 2 changes nothing (seq guard)
    ApplyChanges.scd1(spark, dir, b2, Seq("id"), "seq",
      Some(col("op") === "D"), Seq("op"))
    assert(scd1State(dir) == Set((1L, "a2", 20L), (3L, "c1", 20L)))
    // an out-of-order straggler older than the applied state is ignored
    ApplyChanges.scd1(spark, dir, feed((1L, "a0", 5L, "U")), Seq("id"), "seq",
      Some(col("op") === "D"), Seq("op"))
    assert(scd1State(dir) == Set((1L, "a2", 20L), (3L, "c1", 20L)))
  }

  test("SCD1: only the newest intra-batch version per key lands") {
    val dir = tmpDir("ac1_multi")
    ApplyChanges.scd1(spark, dir, feed(
      (1L, "v1", 10L, "I"), (1L, "v2", 20L, "U"), (1L, "v3", 30L, "U"),
      (2L, "x1", 10L, "I"), (2L, "x1", 20L, "D")),
      Seq("id"), "seq", Some(col("op") === "D"), Seq("op"))
    // key 1: newest wins; key 2: newest is a delete → never inserted
    assert(scd1State(dir) == Set((1L, "v3", 30L)))
  }

  private def scd2State(dir: String): Set[(Long, String, Long, Option[Long])] =
    Versioned.read(spark, dir).select("id", "name", "__START_AT", "__END_AT")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("SCD2: history accumulates as validity intervals; deletes close without inserting") {
    val dir = tmpDir("ac2")
    ApplyChanges.scd2(spark, dir, feed(
      (1L, "a1", 10L, "I"), (2L, "b1", 10L, "I")),
      Seq("id"), "seq", Some(col("op") === "D"), Seq("op"))
    assert(scd2State(dir) == Set(
      (1L, "a1", 10L, None), (2L, "b1", 10L, None)))
    // update 1 (closes the open row, opens a new one), delete 2 (closes)
    val b2 = feed((1L, "a2", 20L, "U"), (2L, "b1", 20L, "D"))
    ApplyChanges.scd2(spark, dir, b2, Seq("id"), "seq",
      Some(col("op") === "D"), Seq("op"))
    assert(scd2State(dir) == Set(
      (1L, "a1", 10L, Some(20L)), (1L, "a2", 20L, None),
      (2L, "b1", 10L, Some(20L))))
    // replay: bit-identical history
    ApplyChanges.scd2(spark, dir, b2, Seq("id"), "seq",
      Some(col("op") === "D"), Seq("op"))
    assert(scd2State(dir) == Set(
      (1L, "a1", 10L, Some(20L)), (1L, "a2", 20L, None),
      (2L, "b1", 10L, Some(20L))))
  }

  test("SCD2: an intra-batch chain lands as bounded segments, delete mid-chain included") {
    val dir = tmpDir("ac2_chain")
    ApplyChanges.scd2(spark, dir, feed(
      (1L, "v1", 10L, "I"), (1L, "v2", 20L, "U"), (1L, "v3", 30L, "U"),
      (2L, "x1", 10L, "I"), (2L, "x1", 20L, "D"), (2L, "x2", 30L, "I")),
      Seq("id"), "seq", Some(col("op") === "D"), Seq("op"))
    assert(scd2State(dir) == Set(
      (1L, "v1", 10L, Some(20L)), (1L, "v2", 20L, Some(30L)), (1L, "v3", 30L, None),
      (2L, "x1", 10L, Some(20L)), (2L, "x2", 30L, None)))
  }

  test("streaming CDC apply: the change feed materializes as SCD1 across restarts") {
    val src = tmpDir("acs_src")
    val tgt = tmpDir("acs_tgt") + "/table"
    val ckpt = tmpDir("acs_ckpt")
    def pump(): Unit = graft.streaming.Ingest.applyChangesStream(
      spark, src, tgt, Seq("id"), "seq", ckpt)
    Versioned.append(Seq((1L, "a1", 10L), (2L, "b1", 10L))
      .toDF("id", "name", "seq"), src) // v1
    pump()
    assert(scd1State(tgt) == Set((1L, "a1", 10L), (2L, "b1", 10L)))
    // upstream UPDATE advancing the sequence + a DELETE + an append:
    // the feed carries them as update pairs / delete rows / inserts
    Versioned.updateWhere(spark, src, col("id") === 1L,
      Map("name" -> org.apache.spark.sql.functions.lit("a2"),
        "seq" -> (col("seq") + 10L))) // v2
    Versioned.deleteWhere(spark, src, col("id") === 2L) // v3
    Versioned.append(Seq((3L, "c1", 30L)).toDF("id", "name", "seq"), src) // v4
    pump() // same checkpoint: only the (v1, v4] window applies
    assert(scd1State(tgt) == Set((1L, "a2", 20L), (3L, "c1", 30L)))
    // a third pump with nothing new upstream is a no-op
    pump()
    assert(scd1State(tgt) == Set((1L, "a2", 20L), (3L, "c1", 30L)))
  }

  test("idempotent apply: the watermark lands in the apply commit; a replayed batchId is a no-op") {
    val dir = tmpDir("ac_idem")
    val b1 = feed((1L, "a1", 10L, "I"))
    assert(ApplyChanges.idempotent(
      spark, dir, b1, Seq("id"), "seq", "cdc", 0L,
      Some(col("op") === "D"), Seq("op")).isDefined)
    val b2 = feed((1L, "a2", 20L, "U"))
    assert(ApplyChanges.idempotent(
      spark, dir, b2, Seq("id"), "seq", "cdc", 1L,
      Some(col("op") === "D"), Seq("op")).isDefined)
    assert(Versioned.lastTxnVersion(spark, dir, "cdc").contains(1L))
    // same batchId again: full no-op, even with different data
    assert(ApplyChanges.idempotent(
      spark, dir, feed((9L, "zz", 99L, "I")), Seq("id"), "seq", "cdc", 1L,
      Some(col("op") === "D"), Seq("op")).isEmpty)
    assert(scd1State(dir) == Set((1L, "a2", 20L)))
  }
}
