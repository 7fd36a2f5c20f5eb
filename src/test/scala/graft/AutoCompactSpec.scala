package graft

import graft.table.Versioned

/** Opportunistic post-append compaction (the Databricks
  * `autoOptimize.autoCompact` analog): with the
  * `graft.autoOptimize.autoCompact` table property set, every
  * `graft.autoOptimize.interval`-th commit triggers a best-effort
  * `compact-small` follow-on commit — streaming ingest self-heals its
  * small files without an external OPTIMIZE job. The trigger is O(1)
  * per commit (interval cadence, not a per-write file census — at 10⁶
  * files a census would be O(snapshot) HEADs on every append).
  */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def ops(dir: String): Seq[String] = {
    val head = Versioned.currentVersion(spark, dir).get
    (1L to head).map(Versioned.opAt(spark, dir, _))
  }

  test("appends on the interval cadence trigger a compact-small follow-on commit") {
    val dir = tmpDir("ac_on")
    Versioned.overwrite(Seq((1L, "a")).toDF("id", "s"), dir) // v1
    Versioned.setProperties(spark, dir, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.interval" -> "4")) // v2
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), dir) // v3
    Versioned.append(Seq((3L, "c")).toDF("id", "s"), dir) // v4 → cadence hit
    // the triggering append is durable AND the auto compaction landed
    // as its own row-preserving commit
    assert(ops(dir) == Seq("overwrite", "set-properties", "append", "append", "compact-small"))
    assert(Versioned.filesAt(
      spark, dir, Versioned.currentVersion(spark, dir).get).size == 1)
    assert(Versioned.read(spark, dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("off-cadence appends and tables without the property never auto-compact") {
    val dir = tmpDir("ac_off")
    Versioned.overwrite(Seq((1L, "a")).toDF("id", "s"), dir) // v1
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), dir) // v2
    Versioned.append(Seq((3L, "c")).toDF("id", "s"), dir) // v3
    assert(!ops(dir).contains("compact-small"), "no property, no compaction")
    val dir2 = tmpDir("ac_off2")
    Versioned.overwrite(Seq((1L, "a")).toDF("id", "s"), dir2) // v1
    Versioned.setProperties(spark, dir2, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.interval" -> "16")) // v2
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), dir2) // v3: off cadence
    assert(!ops(dir2).contains("compact-small"))
  }

  test("the idempotent (streaming-sink) append path triggers too, and streams skip the commit") {
    val dir = tmpDir("ac_idem")
    Versioned.overwrite(Seq((1L, "a")).toDF("id", "s"), dir) // v1
    Versioned.setProperties(spark, dir, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.interval" -> "3")) // v2
    Versioned.appendIdempotent(Seq((2L, "b")).toDF("id", "s"), dir, "ac", 0L) // v3 → hit
    assert(ops(dir) == Seq("overwrite", "set-properties", "append", "compact-small"))
    // row-preserving: an insert-only stream over the window emits the
    // appended rows and NOTHING for the auto-compact rewrite
    assert(Versioned.streamBatch(spark, dir, 2L, 4L).count() == 1L)
    // replayed batch id: still refused after the auto-compact commit
    assert(Versioned.appendIdempotent(
      Seq((2L, "b")).toDF("id", "s"), dir, "ac", 0L).isEmpty)
  }

  test("a cadence hit with nothing small is a silent no-op") {
    val dir = tmpDir("ac_noop")
    Versioned.overwrite(Seq((1L, "a")).toDF("id", "s"), dir) // v1
    Versioned.setProperties(spark, dir, Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.interval" -> "3",
      "graft.autoOptimize.smallBytes" -> "1")) // v2: no file is ever < 1 byte
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), dir) // v3 → cadence, nothing small
    assert(!ops(dir).contains("compact-small"))
    assert(Versioned.read(spark, dir).count() == 2)
  }
}
