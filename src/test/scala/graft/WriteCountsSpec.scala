package graft

import org.apache.spark.sql.functions.col

import graft.table.{RowStats, Versioned, WriteCounts}

/** Row counts come FROM THE WRITE JOB (task output metrics), not a
  * post-commit footer pass: an append publishes a correct row-stats
  * sidecar with ZERO footer reads; capture ambiguity
  * (`maxRecordsPerFile` splitting one partition into several files)
  * falls back to footers and stays correct; the distributed compute
  * branch keys files O(1) and defaults absent groups (zero-row files)
  * to 0 so coverage converges.
  */
class WriteCountsSpec extends SparkSpec {
  import spark.implicits._

  private def footers[T](body: => T): (T, Long) = {
    val r0 = RowStats.footerReads.get()
    val out = body
    (out, RowStats.footerReads.get() - r0)
  }

  test("append publishes exact per-file counts with zero footer reads") {
    val dir = tmpDir("wc_append")
    val df = (1L to 97L).toDF("id").repartition(4)
    val (_, fr) = footers(Versioned.append(df, dir))
    assert(fr == 0L, s"commit-path row stats must not re-open footers ($fr)")
    val counts = Versioned.rowCountsAt(spark, dir, 1L)
    assert(counts.isDefined, "sidecar must cover the snapshot")
    assert(counts.get.values.sum == 97L)
    assert(counts.get.size == Versioned.filesAt(spark, dir, 1L).size)
    assert(Versioned.metaRowCountAt(spark, dir, 1L).contains(97L))
  }

  test("a second append carries kept counts and stats only its own files") {
    val dir = tmpDir("wc_carry")
    Versioned.append((1L to 50L).toDF("id").repartition(2), dir)
    val (_, fr) = footers(
      Versioned.append((51L to 80L).toDF("id").repartition(3), dir))
    assert(fr == 0L, s"carry must not re-open kept or fresh footers ($fr)")
    assert(Versioned.metaRowCountAt(spark, dir, 2L).contains(80L))
  }

  test("maxRecordsPerFile splits are unvouchable; footer fallback stays exact") {
    val dir = tmpDir("wc_split")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "7")
    try {
      val (_, fr) = footers(
        Versioned.append((1L to 20L).toDF("id").coalesce(1), dir))
      // one partition → three files sharing part-index 0: capture must
      // refuse them, and the carry must heal via footers — correctly
      assert(Versioned.filesAt(spark, dir, 1L).size == 3)
      assert(fr == 3L, s"split files must be footer-statted ($fr)")
      assert(Versioned.metaRowCountAt(spark, dir, 1L).contains(20L))
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  test("capture scopes to its own write; concurrent-job indices cannot collide") {
    val dir = tmpDir("wc_scope")
    // a join forces AQE shuffle-materialization jobs under the same
    // action — their tasks write no bytes and must not pollute capture
    val a = (1L to 60L).map(i => (i, i * 2)).toDF("id", "v")
    val b = (1L to 60L).map(i => (i, s"n$i")).toDF("id", "name")
    Versioned.append(a.join(b, "id").repartition(2, col("id")), dir)
    assert(Versioned.metaRowCountAt(spark, dir, 1L).contains(60L))
  }

  test("distributed compute defaults zero-row files to 0 and converges") {
    val dir = tmpDir("wc_zero")
    // an empty 1-partition write produces a real 0-row parquet file
    Versioned.append((1L to 5L).toDF("id").coalesce(1), dir)
    Versioned.append(spark.range(0).toDF("id").coalesce(1), dir)
    val files = Versioned.filesAt(spark, dir, 2L)
    assert(files.size == 2)
    val prev = RowStats.DriverFooterMax
    RowStats.DriverFooterMax = 1 // force the distributed branch
    try {
      val counts = RowStats.compute(spark, dir, files)
      assert(counts.size == 2, s"every file must get a count: $counts")
      assert(counts.values.toSeq.sorted == Seq(0L, 5L))
    } finally RowStats.DriverFooterMax = prev
    // ANALYZE converges: second run stats nothing fresh
    Versioned.analyzeTable(spark, dir)
    val (_, statted) = Versioned.analyzeTable(spark, dir)
    assert(statted == 0L, "re-analyze must not re-stat covered files")
  }

  test("capture API reports per-partition records for a plain write") {
    WriteCounts.clear()
    val df = (1L to 30L).toDF("id").repartition(3)
    val out = tmpDir("wc_capture") + "/out"
    val byIndex = WriteCounts.capture(df, df.write.parquet(out))
    assert(byIndex.values.sum == 30L, s"captured $byIndex")
    assert(byIndex.keySet.subsetOf(Set(0, 1, 2)))
  }
}
