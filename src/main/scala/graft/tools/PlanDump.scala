package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round instrumentation: dump `.explain("formatted")` for
  * named declared queries to `<outDir>/<name>_<tag>.txt`, and
  * optionally time the noop-sink action (guide §1.4) so the plan and
  * an isolated wall number land together.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [q1 q2 ...]
  * (no names = every declared query). SPARK_GRAFT_CPUS as in Bench.
  * Building a composite query's DataFrame executes its fixture work
  * (commits, streams) exactly as Bench does before its measured action;
  * the dumped plan is the plan of the RESULT frame — for scan/join/agg
  * queries that is the whole query, for composite fixtures it is the
  * read-back side.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    names.foreach { name =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuilt = System.nanoTime()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.format("noop").mode("overwrite").save()
        val tDone = System.nanoTime()
        val hdr =
          f"-- $name @ $sfDir cpus=$cpus  build=${(tBuilt - t0) / 1e9}%.3fs" +
            f" noop=${(tDone - tBuilt) / 1e9}%.3fs total=${(tDone - t0) / 1e9}%.3fs%n"
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), hdr + plan)
        println(hdr.trim)
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
