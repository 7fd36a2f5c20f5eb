package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.Versioned

/** Phase profiler for the x_batch_cdf_wide fixture (test scope, dev only). */
object ProfileCdfWide {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def ph[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = s.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_id") % 7 === 0)
      .withColumn("value_c", floor(col("value") * 100).cast("long"))
      .withColumn("slice", ((col("event_id") % 448) / 7).cast("int"))
      .select("event_id", "user_id", "event_type", "value_c", "slice")
    val tableDir = java.nio.file.Files.createTempDirectory("pcdf").toString
    val stage = java.nio.file.Files.createTempDirectory("pcdf_stage").toString
    ph("stage-write") {
      base.repartition(col("slice")).write.partitionBy("slice").parquet(s"$stage/p")
    }
    val fsys = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val sch = org.apache.spark.sql.types.StructType(
      base.schema.fields.filterNot(_.name == "slice"))
    ph("64-addFiles") {
      (0 until 64).foreach { i =>
        val src = new org.apache.hadoop.fs.Path(s"$stage/p/slice=$i")
        val dst = new org.apache.hadoop.fs.Path(s"$tableDir/d-cdc-$i")
        require(fsys.rename(src, dst), s"staging move failed for slice $i")
        val files = fsys.listStatus(dst).toSeq.map(_.getPath.getName)
          .filter(_.endsWith(".parquet")).sorted.map(n => s"d-cdc-$i/$n")
        Versioned.addFiles(s, tableDir, files, knownSchema = Some(sch))
      }
    }
    ph("update") {
      Versioned.updateWhere(s, tableDir, col("event_type") === "click",
        Map("value_c" -> (col("value_c") + 7)))
    }
    ph("delete") {
      Versioned.deleteWhere(s, tableDir, col("user_id") % 9 === 0)
    }
    val n = ph("cdf-read") {
      s.read.format("graft-versioned")
        .option("readChangeFeed", "true").option("startingVersion", 1)
        .load(tableDir)
        .groupBy("_change_type", "_commit_version")
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
        .count()
    }
    println(s"rows=$n")
    s.stop()
  }
}
