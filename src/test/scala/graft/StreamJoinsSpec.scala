package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoins

/** Stream-stream interval join and watermark-bounded streaming dedup:
  * results must match the batch formulation on the in-window data, and
  * the state contracts (eviction past the interval, dedup forgetting
  * past the delay) must be observable.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("stream-stream interval join matches the batch inequality join") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    val l = lIn.toDF().toDF("k", "l_ts", "l_tag").withWatermark("l_ts", "1 hour")
    val r = rIn.toDF().toDF("k", "r_ts", "r_tag").withWatermark("r_ts", "1 hour")
    // right rows up to 2h BEFORE through 1h after each left row
    val q = StreamJoins.intervalJoin(l, r, "k", "l_ts", "r_ts", -7200L, 3600L)
      .select("k", "l_tag", "r_tag")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      lIn.addData((1L, ts(10), "L1"), (2L, ts(12), "L2"))
      rIn.addData(
        (1L, ts(8, 30), "Rin-before"),  // 1.5h before L1: in [-2h, +1h]
        (1L, ts(10, 30), "Rin-after"),  // 0.5h after L1: in window
        (1L, ts(12), "Rout-late"),      // 2h after L1: out of window
        (2L, ts(9), "Rout-early"),      // 3h before L2: out of window
        (3L, ts(10), "Rout-nokey"))
      // advance both watermarks so results emit; distinct keys so the
      // two push rows cannot join each other
      lIn.addData((98L, ts(23), "wm-push"))
      rIn.addData((99L, ts(23), "wm-push"))
      q.processAllAvailable()

      val got = spark.table("ssj_out").as[(Long, String, String)].collect().toSet
      assert(got == Set((1L, "L1", "Rin-before"), (1L, "L1", "Rin-after")),
        s"unexpected join output: $got")
    } finally q.stop()
  }

  test("dedupWithinWatermark drops near duplicates but forgets keys past the delay") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamJoins.dedupWithinWatermark(
        in.toDF().toDF("id", "ev_ts", "tag"), Seq("id"), "ev_ts", "1 hour")
      .select("id", "tag")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((7L, ts(1), "first"), (7L, ts(1, 20), "dup-close"))
      q.processAllAvailable()
      // watermark advances far past ts(1)+delay: id 7's dedup state evicts
      in.addData((8L, ts(20), "other"))
      q.processAllAvailable()
      in.addData((7L, ts(21), "reappears"))
      q.processAllAvailable()

      val tags = spark.table("dedup_out").as[(Long, String)].collect().toSet
      assert(tags.contains((7L, "first")) && !tags.contains((7L, "dup-close")),
        s"near duplicate must be dropped: $tags")
      assert(tags.contains((7L, "reappears")),
        s"key must be forgotten after the watermark delay: $tags")
    } finally q.stop()
  }

  test("KMV sketch aggregate runs inside a watermarked streaming window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF().toDF("ev_ts", "uid")
      .withWatermark("ev_ts", "1 hour")
      .groupBy(window(col("ev_ts"), "1 hour").as("w"))
      .agg(graft.plans.expressions.kMinValues(col("uid"), 4).as("kmin"))
      .select(col("w.start").as("ws"), col("kmin"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1, 5), 50L), (ts(1, 10), 30L), (ts(1, 20), 30L),
        (ts(1, 30), 10L), (ts(1, 40), 70L), (ts(1, 50), 20L))
      q.processAllAvailable()
      in.addData((ts(10), 99L)) // advance watermark: hour-1 window closes
      q.processAllAvailable()
      in.addData((ts(11), 98L))
      q.processAllAvailable()
      val got = spark.table("kmv_stream_out")
        .select("kmin").as[Seq[Long]].collect()
      assert(got.length == 1 && got.head == Seq(10L, 20L, 30L, 50L),
        s"streaming KMV must equal the batch sketch of the closed window: ${got.toSeq}")
    } finally q.stop()
  }

  test("batch interval-join twin: same predicate via RangeJoin bucketing") {
    // the streaming operator's predicate equals RangeJoin.joinRange on
    // epoch-seconds: check on a small batch both agree
    val ls = Seq((1L, 1000L, "a"), (1L, 5000L, "b"), (2L, 1000L, "c"))
    val rs = Seq((1L, 900L, "x"), (1L, 1500L, "y"), (1L, 5200L, "z"), (2L, 4000L, "w"))
    val got = graft.operators.RangeJoin.joinRange(
        ls.toDF("k", "ts", "ltag"), rs.toDF("k", "rts", "rtag"),
        Seq("k"), "ts", "rts", lo = -200L, hi = 601L, payload = Seq("rtag"))
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    val want = (for {
      (lk, lt, la) <- ls; (rk, rt, ra) <- rs
      if lk == rk && rt >= lt - 200L && rt < lt + 601L
    } yield (la, ra)).toSet
    assert(got == want && want == Set(("a", "x"), ("a", "y"), ("b", "z")))
  }
}
