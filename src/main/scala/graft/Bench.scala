package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: wall-seconds per declared query at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (also written to
  * bench_out.json — sbt log prefixes make stdout parsing fragile).
  *
  * The measured action hashes EVERY output column (xxhash64 over a
  * struct of the full row, summed) — a plain count() would let Catalyst
  * prune the projections away and under-measure projection-heavy
  * queries.
  */
object Bench {

  private def force(df: DataFrame): Unit = {
    val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
    h.agg(count(lit(1)), sum(col("__h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle machinery, parquet reader) so
    // the first measured query doesn't absorb JVM startup; fixed name
    // order keeps per-query numbers comparable across rounds.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
