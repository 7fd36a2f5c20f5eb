package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._

/** The size gate on MERGE's touched-file discovery
  * ([[Versioned.MergeKeyBroadcastMaxBytes]]): a micro-batch source
  * keeps the zero-shuffle broadcast probe, while a backfill-sized key
  * set must NOT be forced into a driver broadcast (8 GB relation
  * ceiling / driver OOM at 100 TB) — above the gate the discovery
  * joins plan as ordinary shuffle semi/anti-joins, Delta's
  * `findTouchedFiles` shape, and the merge still lands correctly.
  */
class MergeScaleSpec extends SparkSpec {

  import spark.implicits._

  test("an above-threshold source declines the broadcast and still merges correctly") {
    val dir = tmpDir("mg_gate")
    Versioned.append((1 to 200).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val b0 = Versioned.mergeKeyBroadcasts.get()
    val s0 = Versioned.mergeKeyShuffles.get()
    val prevGate = Versioned.MergeKeyBroadcastMaxBytes
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the over-threshold decision, and forbid the planner from
      // broadcasting on its own — the merge must survive a genuine
      // shuffle semi-join plan
      Versioned.MergeKeyBroadcastMaxBytes = 0L
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val src = (150 to 250).map(i => (i, s"m$i")).toDF("id", "s")
      Versioned.merge(spark, dir, src, Seq("id"))
    } finally {
      Versioned.MergeKeyBroadcastMaxBytes = prevGate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
    assert(Versioned.mergeKeyShuffles.get() > s0,
      "the gate must decline the broadcast hint for an over-threshold source")
    assert(Versioned.mergeKeyBroadcasts.get() == b0)
    val got = Versioned.read(spark, dir).as[(Int, String)].collect().toMap
    assert(got.size == 250)
    assert(got(100) == "v100", "untouched rows carry")
    assert(got(150) == "m150", "matched rows update")
    assert(got(250) == "m250", "unmatched source rows insert")
  }

  test("a micro-batch source keeps the broadcast probe (the default decision)") {
    val dir = tmpDir("mg_small")
    Versioned.append((1 to 50).map(i => (i, s"v$i")).toDF("id", "s"), dir)
    val b0 = Versioned.mergeKeyBroadcasts.get()
    Versioned.merge(spark, dir, Seq((1, "u1"), (51, "n51")).toDF("id", "s"), Seq("id"))
    assert(Versioned.mergeKeyBroadcasts.get() > b0,
      "a small source's key set must broadcast under the default gate")
    val got = Versioned.read(spark, dir).as[(Int, String)].collect().toMap
    assert(got(1) == "u1" && got(51) == "n51" && got.size == 51)
  }
}
