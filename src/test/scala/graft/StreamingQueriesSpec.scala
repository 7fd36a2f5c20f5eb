package graft

import org.apache.spark.sql.functions._

import graft.queries.{StreamingQueries, Tables, Temporal}

/** The oracle-gated streaming queries (st1/st2): the actual streaming
  * engine — readStream, AvailableNow drain, memory sink — must produce
  * exactly the batch answer over the same input. These are the local
  * twins of the DuckDB hash-checks the driver runs at sf0.01.
  */
class StreamingQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("st1: streamed tumbling agg equals the batch w2 result") {
    val streamed = StreamingQueries.streamAgg(spark, sf).collect().toSeq
    val batch = Temporal.windowedAgg(spark, sf).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("st2: streamed stream-static join equals the batch join") {
    val streamed = StreamingQueries.streamStaticJoin(spark, sf).collect().toSeq
    val ev = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val dim = Tables.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = ev.join(dim, ev("user_id") === dim("c_custkey"))
      .select("event_id", "user_id", "cents", "c_mktsegment")
      .orderBy("event_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("st3: streamed stateful dedup equals batch DISTINCT") {
    val streamed = StreamingQueries.streamDedup(spark, sf).collect().toSeq
    val batch = Tables.t(spark, sf, "events")
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("st4: streamed stream-stream join equals the batch self-join") {
    val streamed = StreamingQueries.streamStreamJoin(spark, sf).collect().toSeq
    val ev = Tables.t(spark, sf, "events")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"))
    val batch = buys.join(views, col("user_id") === col("v_user"))
      .select("user_id", "buy_id", "view_id")
      .orderBy("user_id", "buy_id", "view_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("st5: append-mode watermark agg emits exactly the finalized windows") {
    val streamed = StreamingQueries.streamWatermarkAgg(spark, sf).collect().toSeq
    // relational replay of the eviction rule: tumbling 1h windows whose
    // end precedes (max event time − 1h)
    val us = expr("ts div 1000")
    val e = Tables.t(spark, sf, "events").select(us.as("us"), col("event_type"))
    val mx = e.agg(max("us")).head().getLong(0)
    val batch = e
      .withColumn("ws", col("us") - col("us") % 3600000000L)
      .filter(col("ws") + 3600000000L <= mx - 3600000000L)
      .groupBy("ws", "event_type").agg(count(lit(1)).as("n"))
      .select(
        date_format(timestamp_micros(col("ws")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // the trailing (unfinalized) window really is withheld
    val allWindows = e.select((col("us") - col("us") % 3600000000L).as("ws"))
      .distinct().count()
    assert(streamed.map(_.getString(0)).distinct.size < allWindows)
  }

  test("st1 is idempotent per session (sink table replaced, not appended)") {
    val first = StreamingQueries.streamAgg(spark, sf).count()
    val second = StreamingQueries.streamAgg(spark, sf).count()
    assert(first == second)
  }
}
