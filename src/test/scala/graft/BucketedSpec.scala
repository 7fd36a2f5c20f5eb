package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.ops.Upsert
import graft.table.{Bucketed, BucketedRef, ZoneSpec}

/** Bucket-partitioned upsert: only buckets containing source keys are
  * rewritten; everything else on disk stays byte-for-byte untouched.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Seq[Long], v: Long) =
    ids.map(i => (i, s"payload_$i", v)).toDF("id", "payload", "version")

  /** (path -> (size, mtime)) for every data file under a bucket dir. */
  private def fileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("upsert rewrites only touched buckets and matches the full-table merge") {
    val root = tmpDir("bucketed")
    val ref = BucketedRef(s"$root/t", numBuckets = 8, keys = Seq("id"))
    val base = rows(0L until 64L, v = 1)
    Bucketed.create(base, ref)
    assert(Bucketed.read(spark, ref).count() == 64)

    // source touching exactly two keys -> at most two buckets
    val source = rows(Seq(3L, 7L), v = 2)
    val touchedBuckets = source.select(ref.bucketCol.as("b"))
      .distinct().as[Int].collect().toSet
    val untouched = (0 until 8).filterNot(touchedBuckets)
    val before = untouched.map(b => b -> fileState(ref.bucketDir(b).dir)).toMap

    Bucketed.upsertLww(spark, ref, source, "version")

    // untouched bucket dirs are byte-identical (same files, sizes, mtimes)
    untouched.foreach { b =>
      assert(fileState(ref.bucketDir(b).dir) == before(b), s"bucket $b was rewritten")
    }

    // result equals the reference full-table LWW merge
    val got = Bucketed.read(spark, ref).orderBy("id").collect().toSeq
    val want = Upsert.lastWriterWins(base, source, Seq("id"), "version")
      .orderBy("id").collect().toSeq
    assert(got == want)
    assert(Bucketed.read(spark, ref).filter(col("id") === 3).head.getLong(2) == 2)
  }

  test("stale source versions lose; new keys land in their buckets") {
    val root = tmpDir("bucketed2")
    val ref = BucketedRef(s"$root/t", numBuckets = 4, keys = Seq("id"))
    Bucketed.create(rows(0L until 10L, v = 5), ref)

    // stale update (version 1 < 5) + brand-new key 100
    Bucketed.upsertLww(spark, ref, rows(Seq(4L, 100L), v = 1), "version")
    val t = Bucketed.read(spark, ref)
    assert(t.count() == 11)
    assert(t.filter(col("id") === 4).head.getLong(2) == 5) // stale lost
    assert(t.filter(col("id") === 100).head.getLong(2) == 1) // inserted
  }

  test("Silver.upsertIntoBucketed: create-if-missing then LWW on ingestion_ts") {
    val root = tmpDir("bucketed4")
    val ref = BucketedRef(s"$root/silver_customers", numBuckets = 4, keys = Seq("id"))
    def batch(ids: Seq[Long], ts: java.sql.Timestamp, city: String) =
      ids.map(i => (i, city, ts)).toDF("id", "city", "ingestion_ts")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

    graft.pipeline.Silver.upsertIntoBucketed(spark, ref, batch(Seq(1L, 2L), t1, "old"))
    graft.pipeline.Silver.upsertIntoBucketed(spark, ref, batch(Seq(2L, 3L), t2, "new"))
    val t = Bucketed.read(spark, ref)
    assert(t.count() == 3)
    assert(t.filter(col("id") === 1).head.getString(1) == "old")
    assert(t.filter(col("id") === 2).head.getString(1) == "new") // newer ts won
  }

  test("source plan executes exactly once for a multi-bucket batch") {
    val root = tmpDir("bucketed5")
    val ref = BucketedRef(s"$root/t", numBuckets = 8, keys = Seq("id"))
    Bucketed.create(rows(0L until 64L, v = 1), ref)

    // A source plan that counts every row it materializes: if upsertLww
    // re-evaluated the source per touched bucket (the pre-staging
    // behavior), the accumulator would read a multiple of the row count.
    val acc = spark.sparkContext.longAccumulator("sourceRowsMaterialized")
    val srcIds = 0L until 16L // spreads over several of the 8 buckets
    val source = rows(srcIds, v = 2).as[(Long, String, Long)]
      .map { r => acc.add(1); r }.toDF("id", "payload", "version")

    Bucketed.upsertLww(spark, ref, source, "version")

    assert(acc.value == srcIds.size,
      s"source plan materialized ${acc.value} rows for a ${srcIds.size}-row batch — " +
        "the plan must execute exactly once (staged), not once per touched bucket")
    val t = Bucketed.read(spark, ref)
    assert(t.count() == 64)
    assert(t.filter(col("id") === 3).head.getLong(2) == 2)
    assert(t.filter(col("id") === 40).head.getLong(2) == 1)
  }

  test("staging dir is per-invocation: a concurrent upsert's stage is never clobbered") {
    val root = tmpDir("bucketed6")
    val ref = BucketedRef(s"$root/t", numBuckets = 4, keys = Seq("id"))
    Bucketed.create(rows(0L until 10L, v = 1), ref)
    // simulate another in-flight upsert staged at the OLD fixed path:
    // before the per-invocation UUID suffix, upsertLww began by
    // deleting exactly this directory — corrupting the concurrent
    // caller's staged input
    val otherStage = new File(s"$root/.t.__stage__")
    assert(otherStage.mkdirs())
    val marker = new File(otherStage, "bucket=0")
    assert(marker.mkdirs())
    Bucketed.upsertLww(spark, ref, rows(Seq(3L), v = 2), "version")
    assert(otherStage.exists() && marker.exists(),
      "a concurrent caller's staging dir must survive another upsert")
    assert(Bucketed.read(spark, ref).filter(col("id") === 3).head.getLong(2) == 2)
    // and this invocation's own staging debris is swept
    val leftover = new File(root).listFiles().map(_.getName)
      .filter(_.startsWith(".t.__stage__")).toSet
    assert(leftover == Set(".t.__stage__"), s"staging debris left behind: $leftover")
  }

  test("upsert into a legacy FLAT table layout fails loudly with a migration message") {
    val root = tmpDir("bucketed7")
    val flatDir = s"$root/t"
    rows(0L until 10L, v = 1).coalesce(1).write.parquet(flatDir) // pre-bucketing layout
    val ref = BucketedRef(flatDir, numBuckets = 4, keys = Seq("id"))
    val ex = intercept[IllegalArgumentException] {
      Bucketed.upsertLww(spark, ref, rows(Seq(3L), v = 2), "version")
    }
    assert(ex.getMessage.contains("FLAT") && ex.getMessage.contains("migrate"),
      s"wanted the migration guard, got: ${ex.getMessage}")
    // the flat table is untouched — corruption refused, not performed
    assert(spark.read.parquet(flatDir).count() == 10)
  }

  test("zone maps: range scans open only the pruned file subset, across upserts") {
    val root = tmpDir("bucketed8")
    val ref = BucketedRef(s"$root/t", numBuckets = 4, keys = Seq("id"))
    val spec = ZoneSpec(Seq("ts"), filesPerBucket = 4)
    def mk(ids: Seq[Long], v: Long) =
      ids.map(i => (i, i * 10L, v)).toDF("id", "ts", "version")
    // 256 keys hash-spread over 4 buckets; ts spans [0, 2550] in EVERY
    // bucket — without range clustering no file could be skipped
    Bucketed.create(mk(0L until 256L, v = 1), ref, Some(spec))

    val all = Bucketed.prunedFiles(spark, ref, "ts", Long.MinValue, Long.MaxValue)
    assert(all.size >= 8, s"expected a multi-file-per-bucket layout, got ${all.size}")
    val pruned = Bucketed.prunedFiles(spark, ref, "ts", 0L, 500L)
    assert(pruned.size <= all.size / 2,
      s"a ~20% range must skip at least half the files: kept ${pruned.size}/${all.size}")
    // results exact, and pruning never loses rows
    val got = Bucketed.readWhere(spark, ref, "ts", 0L, 500L)
      .select("id").as[Long].collect().toSet
    assert(got == (0L to 50L).toSet)
    // un-zoned column: nothing pruned, scan still correct
    assert(Bucketed.prunedFiles(spark, ref, "version", 0L, 0L) == all)

    // an upsert refreshes touched buckets' zones and keeps the rest:
    // move two keys to ts values far outside their old file ranges
    val src = Seq((3L, 2000L, 2L), (7L, 2100L, 2L)).toDF("id", "ts", "version")
    Bucketed.upsertLww(spark, ref, src, "version")
    val got2 = Bucketed.readWhere(spark, ref, "ts", 0L, 500L)
      .select("id").as[Long].collect().toSet
    assert(got2 == (0L to 50L).toSet -- Set(3L, 7L),
      "moved keys must leave the range after the upsert")
    // ids with ts in [1990, 2150]: the untouched 199..215 plus the two
    // moved keys (3 -> 2000, 7 -> 2100)
    val got3 = Bucketed.readWhere(spark, ref, "ts", 1990L, 2150L)
      .select("id").as[Long].collect().toSet
    assert(got3 == (199L to 215L).toSet ++ Set(3L, 7L), s"got $got3")
    // the refreshed sidecar still prunes
    val prunedAfter = Bucketed.prunedFiles(spark, ref, "ts", 0L, 500L)
    val allAfter = Bucketed.prunedFiles(spark, ref, "ts", Long.MinValue, Long.MaxValue)
    assert(prunedAfter.size < allAfter.size,
      s"zones must survive the upsert: kept ${prunedAfter.size}/${allAfter.size}")
    // an empty range opens zero files but keeps the schema
    assert(Bucketed.readWhere(spark, ref, "ts", 100000L, 200000L).isEmpty)
    assert(Bucketed.readWhere(spark, ref, "ts", 100000L, 200000L)
      .columns.toSeq == Seq("id", "ts", "version"))
  }

  test("upsert is idempotent: replaying the same source converges") {
    val root = tmpDir("bucketed3")
    val ref = BucketedRef(s"$root/t", numBuckets = 4, keys = Seq("id"))
    Bucketed.create(rows(0L until 10L, v = 1), ref)
    val source = rows(Seq(2L, 9L), v = 3)
    Bucketed.upsertLww(spark, ref, source, "version")
    val once = Bucketed.read(spark, ref).orderBy("id").collect().toSeq
    Bucketed.upsertLww(spark, ref, source, "version")
    val twice = Bucketed.read(spark, ref).orderBy("id").collect().toSeq
    assert(once == twice)
  }
}
