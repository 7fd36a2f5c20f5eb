package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** Timestamp-addressed change feeds (Delta's `startingTimestamp` /
  * `endingTimestamp`): wall-clock endpoints resolve through the
  * commit-timestamp index — start = first commit AT OR AFTER the
  * instant, end = last commit AT OR BEFORE it — then serve the same
  * version window the version options would.
  */
class CdfTimestampSpec extends SparkSpec {

  import spark.implicits._

  private def build(dir: String): Seq[Long] = {
    (1 to 4).foreach { i =>
      Versioned.append(Seq((i, i * 10)).toDF("id", "x"), dir)
      Thread.sleep(3) // commit timestamps must be distinguishable
    }
    (1L to 4L).map(Versioned.commitTimestampAt(spark, dir, _))
  }

  test("startingTimestamp == the equivalent startingVersion window") {
    val dir = tmpDir("cdfts_start")
    val ts = build(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "_change_type", "_commit_version")
        .as[(Int, String, Long)].collect().toSet
    val byTs = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", ts(2).toString) // first commit >= ts(v3) is v3
      .load(dir)
    val byV = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true").option("startingVersion", 2)
      .load(dir)
    assert(rows(byTs) == rows(byV))
    assert(rows(byTs) == Set((3, "insert", 3L), (4, "insert", 4L)))
  }

  test("endingTimestamp == the equivalent endingVersion window") {
    val dir = tmpDir("cdfts_end")
    val ts = build(dir)
    val feed = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1)
      .option("endingTimestamp", ts(2).toString) // last commit <= ts(v3) is v3
      .load(dir)
      .select("id", "_commit_version").as[(Int, Long)].collect().toSet
    assert(feed == Set((2, 2L), (3, 3L)))
  }

  test("version and timestamp forms are mutually exclusive; bad instants fail loudly") {
    val dir = tmpDir("cdfts_bad")
    val ts = build(dir)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1).option("startingTimestamp", ts(1).toString)
        .load(dir)
    }
    // an instant after every commit: nothing to start from
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", (ts(3) + 60000).toString)
        .load(dir)
    }
    // an instant before every commit: nothing to end at
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("readChangeFeed", "true")
        .option("endingTimestamp", (ts(0) - 60000).toString)
        .load(dir)
    }
  }

  test("streaming startingTimestamp tails from the first commit at or after it") {
    val dir = tmpDir("cdfts_stream")
    val ts = build(dir)
    val out = tmpDir("cdfts_sink")
    val q = spark.readStream.format("graft-versioned")
      .option("startingTimestamp", ts(2).toString)
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/data").as[(Int, Int)].collect().toSet
    assert(got == Set((3, 30), (4, 40)))
  }

  test("ISO and date-only timestamp strings parse (UTC)") {
    assert(Versioned.parseTimestampMillis("1755216000000") == 1755216000000L)
    assert(Versioned.parseTimestampMillis("2026-08-14T00:00:00Z") ==
      java.time.Instant.parse("2026-08-14T00:00:00Z").toEpochMilli)
    assert(Versioned.parseTimestampMillis("2026-08-14 00:00:00") ==
      Versioned.parseTimestampMillis("2026-08-14"))
  }
}
