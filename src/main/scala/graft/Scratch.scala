package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling main — not part of the product surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("x_length_quantiles", "x_vocab_topk", "x_split_assign").foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Window") ||
          l.contains("HashAggregate") || l.contains("TakeOrdered") || l.contains("Scan"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
