package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc query runner for local iteration (test scope — never ships):
  *
  *   sbt "Test/runMain graft.tools.RunQuery <sfDir> q1 q2 ..."
  *
  * prints `name=rows` per query; an argument `a==b` runs both and
  * prints the symmetric exceptAll difference (0 = identical multisets).
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    args.tail.foreach { a =>
      val t0 = System.nanoTime()
      a.split("==") match {
        case Array(x, y) =>
          val dx = qs(x)(spark, sfDir)
          val dy = qs(y)(spark, sfDir)
          val diff = dx.exceptAll(dy).count() + dy.exceptAll(dx).count()
          println(f"RESULT $a diff=$diff time=${(System.nanoTime() - t0) / 1e9}%.2fs")
        case Array(x) =>
          val df = qs(x)(spark, sfDir)
          val n = df.count()
          // SPARK_GRAFT_DUMP=<dir>: also write the result parquet +
          // oracle SQL there, so tools/check.py --skip-verify can
          // oracle-compare ONE query without a full Verify run
          sys.env.get("SPARK_GRAFT_DUMP").foreach { out =>
            df.coalesce(1).write.mode("overwrite").parquet(s"$out/$x")
          }
          println(f"RESULT $x rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
