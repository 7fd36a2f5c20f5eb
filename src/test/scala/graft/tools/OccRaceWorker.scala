package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.Versioned

/** One PROCESS of the cross-process OCC proof (test scope — never
  * ships). The in-JVM concurrency specs (latched threads, CrashFault
  * kill schedules) share one filesystem view and one JVM's file-lock
  * table; forked workers are the claim the hard-link CAS actually
  * makes — MUTUAL EXCLUSION BETWEEN PROCESSES with no coordination but
  * the filesystem. [[graft.CrossProcessOccSpec]] forks several of
  * these against one table dir and asserts every commit landed exactly
  * once.
  *
  *   OccRaceWorker <tableDir> <workerId> <nCommits> <mode>
  *
  * mode `append`: nCommits single-row appends (each row tagged
  * (workerId, seq)); mode `merge`: nCommits insert-only merges of one
  * fresh key each — the path that additionally exercises the
  * commute/re-plan loop under cross-process races.
  *
  * Prints `WORKER <id> DONE <n>` on success; any lost CAS that the OCC
  * retry could not absorb crashes the process (nonzero exit).
  */
object OccRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, workerIdS, nS, mode) = args
    val workerId = workerIdS.toLong
    val n = nS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until n).foreach { seq =>
      val row = Seq((workerId, seq.toLong)).toDF("worker", "seq")
      mode match {
        case "append" => Versioned.append(row, tableDir)
        case "merge" => Versioned.merge(spark, tableDir, row, Seq("worker", "seq"))
        case other => sys.error(s"unknown mode $other")
      }
    }
    println(s"WORKER $workerId DONE $n")
    spark.stop()
  }
}
