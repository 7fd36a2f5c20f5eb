package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: wall-seconds per declared query at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (also written to
  * bench_out.json — sbt log prefixes make stdout parsing fragile).
  *
  * The measured action hashes EVERY output column (xxhash64 over a
  * struct of the full row, xor-folded) — a plain count() would let
  * Catalyst prune the projections away and under-measure
  * projection-heavy queries. The fold is bit_xor, NOT sum: summing
  * full-range 64-bit hashes overflows long, which under Spark 4's
  * default ANSI mode aborts the final stage (ARITHMETIC_OVERFLOW);
  * xor is closed over long so the action completes regardless of
  * row count.
  */
object Bench {

  private def force(df: DataFrame): Unit = {
    val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
    h.agg(count(lit(1)), bit_xor(col("__h"))).collect()
    ()
  }

  /** /proc/stat first-line tick counters (zeros off-Linux): co-tenant
    * CPU STEAL is invisible in loadavg but directly degrades measured
    * wall time under load (observed: 11% steal while 32 cores busy on
    * an otherwise idle-looking host) — stamping the run's own steal
    * fraction lets noise adjudication read the JSON.
    */
  private def cpuTicks(): Option[Array[Long]] =
    try {
      val line = java.nio.file.Files.readAllLines(Paths.get("/proc/stat")).get(0)
      Some(line.trim.split("\\s+").drop(1).map(_.toLong))
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val ticks0 = cpuTicks()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle machinery, parquet reader) so
    // the first measured query doesn't absorb JVM startup; fixed name
    // order keeps per-query numbers comparable across rounds.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // A failed query records its wall time AND an error entry — a
    // broken query must be visible in the artifact, never silently
    // folded into a plausible-looking timing.
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run for targeted profiling
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}" +
          " — a typo here would otherwise produce a plausible-looking empty bench run")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val runs = selected.map { case (name, fn) =>
      // Per-query isolation: queries materialize localCheckpoint blocks
      // while building their plans; left in the block manager they
      // crowd storage memory and taint every LATER query's measurement
      // (observed: same query 20 s isolated vs 136 s late in a polluted
      // run). Dropping finished queries' blocks measures each query
      // from the same clean state its own users would see.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // ContextCleaner reclaims shuffle files and torn-down broadcasts
      // only when their weak refs are GC'd; without an explicit GC the
      // debris of 60+ prior queries stays live and late queries measure
      // up to 4× slower than isolated (observed: x_curate 13 s isolated
      // vs 58 s late in a full run)
      System.gc()
      val t0 = System.nanoTime()
      val err = try { force(fn(spark, sfDir)); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          Some(s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Per-query seconds at 3 decimals, cost-DESCENDING: the driver
    // stores only a bounded tail of stdout, and 148 queries at full
    // float precision overflowed it (BENCH_r15.json parsed 68 of 148).
    // Three decimals (ms resolution — below the co-tenant noise floor)
    // plus most-expensive-first ordering keeps the rows that matter
    // for round-over-round comparison inside any truncation window.
    val qs = runs.sortBy(-_._2)
      .map { case (k, v, _) => jstr(k) + ":" + f"$v%.3f" }.mkString("{", ",", "}")
    val errs = runs.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = f"${runs.map(_._2).sum}%.3f"
    // Host-load stamp: isolated re-measures of commit-heavy composites
    // disagree 2-3x across sessions when co-tenant load is high; recording
    // the 1-min load average alongside the numbers lets noise adjudication
    // read the JSON instead of reconstructing host state after the fact.
    val loadavg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // steal fraction over THIS run's window (field 8 of /proc/stat's
    // cpu line is steal ticks); loadavg alone misses co-tenant steal.
    // If EITHER sample failed, stamp null — a lifetime-since-boot delta
    // would look like a plausible per-run number while measuring the
    // wrong window.
    val steal = (for { t0 <- ticks0; t1 <- cpuTicks() } yield {
      val dt = t1.zip(t0).map { case (b, a) => b - a }
      if (dt.length > 7 && dt.sum > 0) f"${dt(7).toDouble / dt.sum}%.4f" else "null"
    }).getOrElse("null")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed":${runs.count(_._3.isDefined)},"loadavg":$loadavg,"steal":$steal,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
