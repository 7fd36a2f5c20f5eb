package graft

import org.apache.spark.sql.functions._

import graft.ops.Upsert
import graft.table.{Table, TableRef}

class TableAndUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("table: exists/overwrite/read/append round-trip") {
    val ref = TableRef(tmpDir("tbl") + "/t1")
    assert(!Table.exists(spark, ref))
    Table.overwriteAtomic(Seq((1, "a"), (2, "b")).toDF("k", "v"), ref)
    assert(Table.exists(spark, ref))
    assert(Table.read(spark, ref).count() === 2)
    Table.append(Seq((3, "c")).toDF("k", "v"), ref)
    assert(Table.read(spark, ref).count() === 3)
  }

  test("table: overwriteAtomic handles read-modify-write of itself") {
    val ref = TableRef(tmpDir("tbl") + "/t2")
    Table.overwriteAtomic(Seq((1, 10), (2, 20)).toDF("k", "v"), ref)
    val doubled = Table.read(spark, ref).withColumn("v", col("v") * 2)
    Table.overwriteAtomic(doubled, ref)
    assert(Table.read(spark, ref).select(sum("v")).as[Long].head() === 60)
  }

  test("M1 insertOnly: new keys appended, existing keys untouched, idempotent") {
    val target = Seq((1, "t1"), (2, "t2")).toDF("k", "v")
    val source = Seq((2, "S2"), (3, "S3")).toDF("k", "v")
    val once = Upsert.insertOnly(target, source, Seq("k"))
    val rows = once.orderBy("k").as[(Int, String)].collect().toSeq
    assert(rows === Seq((1, "t1"), (2, "t2"), (3, "S3")))
    // file-level idempotence: merging the same source again is a no-op
    val twice = Upsert.insertOnly(once, source, Seq("k"))
    assert(twice.orderBy("k").as[(Int, String)].collect().toSeq === rows)
  }

  test("M2 lastWriterWins: newer source wins, stale source is a no-op, new keys insert") {
    val target = Seq((1, "old", 10L), (2, "cur", 20L)).toDF("k", "v", "ver")
    val source = Seq((1, "new", 15L), (2, "stale", 5L), (3, "ins", 1L)).toDF("k", "v", "ver")
    val merged = Upsert.lastWriterWins(target, source, Seq("k"), "ver")
      .orderBy("k").as[(Int, String, Long)].collect().toSeq
    assert(merged === Seq((1, "new", 15L), (2, "cur", 20L), (3, "ins", 1L)))
  }

  test("M2 merge with explicit setCols only updates listed columns") {
    val target = Seq((1, "a", "keep")).toDF("k", "v", "w")
    val source = Seq((1, "A", "CLOBBER")).toDF("k", "v", "w")
    val merged = Upsert.merge(target, source, Seq("k"), setCols = Seq("v"))
      .as[(Int, String, String)].collect().toSeq
    assert(merged === Seq((1, "A", "keep")))
  }

  test("merge is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    val target = Seq((1, "a", 1L), (2, "b", 2L)).toDF("k", "v", "ver")
    val source = Seq((2, "B", 9L), (3, "C", 3L)).toDF("k", "v", "ver")
    val once = Upsert.lastWriterWins(target, source, Seq("k"), "ver")
    val twice = Upsert.lastWriterWins(once, source, Seq("k"), "ver")
    assert(twice.orderBy("k").collect().toSeq === once.orderBy("k").collect().toSeq)
  }

  test("M4 update-all merge: matched rows fully replaced") {
    val target = Seq((1, "a", 1L)).toDF("k", "v", "ver")
    val source = Seq((1, "A", 0L)).toDF("k", "v", "ver")
    // unconditional (M3/M4): source wins even with older version
    val merged = Upsert.merge(target, source, Seq("k"))
      .as[(Int, String, Long)].collect().toSeq
    assert(merged === Seq((1, "A", 0L)))
  }

  test("merge handles composite keys") {
    val target = Seq((1, 1, "a"), (1, 2, "b")).toDF("k1", "k2", "v")
    val source = Seq((1, 2, "B"), (2, 1, "c")).toDF("k1", "k2", "v")
    val merged = Upsert.merge(target, source, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Int, Int, String)].collect().toSeq
    assert(merged === Seq((1, 1, "a"), (1, 2, "B"), (2, 1, "c")))
  }
}
