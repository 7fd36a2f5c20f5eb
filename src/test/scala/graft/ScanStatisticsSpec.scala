package graft

import graft.table.Versioned

/** DSv2 scan statistics — the auto-broadcast story. Spark's join
  * planner broadcasts a side only when its size ESTIMATE clears
  * `autoBroadcastJoinThreshold`; a DSv2 scan that reports no
  * statistics is costed at `defaultSizeInBytes` (Long.Max) and NEVER
  * auto-broadcasts. At 100 TB that turns every star join against a
  * kilobyte-sized dimension into a full shuffle of the fact side.
  *
  * The clean-snapshot fast path inherits Spark's own `FileScan`
  * statistics (sum of live file sizes). These tests pin that AND the
  * non-fast paths (DV'd / column-mapped snapshots through the V1
  * bridge), which must report log-derived sizes themselves.
  */
class ScanStatisticsSpec extends SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshCat(tag: String): (String, String) = {
    val cat = s"statcat_$tag"
    val wh = tmpDir(s"statwh_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    (cat, wh)
  }

  /** A small dim table (3 rows) and a bigger fact frame; returns the
    * executed plan of the unhinted join through the catalog.
    */
  private def joinPlan(cat: String): String = {
    val fact = spark.range(0, 50000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    fact.createOrReplaceTempView(s"${cat}_fact")
    spark.sql(s"SELECT f.k, sum(f.v) AS s FROM ${cat}_fact f " +
        s"JOIN $cat.db.dim d ON f.k = d.k GROUP BY f.k")
      .queryExecution.executedPlan.toString
  }

  test("clean snapshot: small versioned dim auto-broadcasts (FileScan stats)") {
    val (cat, _) = freshCat("clean")
    spark.sql(s"CREATE TABLE $cat.db.dim (k BIGINT, name STRING)")
    spark.sql(s"INSERT INTO $cat.db.dim VALUES (0,'a'), (1,'b'), (2,'c')")
    val p = joinPlan(cat)
    assert(p.contains("BroadcastHashJoin"),
      s"clean small dim should auto-broadcast:\n$p")
  }

  test("DV'd snapshot: small versioned dim still auto-broadcasts (V1 bridge stats)") {
    val (cat, _) = freshCat("dv")
    spark.sql(s"CREATE TABLE $cat.db.dim (k BIGINT, name STRING)")
    spark.sql(s"INSERT INTO $cat.db.dim VALUES (0,'a'), (1,'b'), (2,'c'), (3,'dead')")
    // a row-level DELETE leaves a deletion vector → non-fast scan path
    spark.sql(s"DELETE FROM $cat.db.dim WHERE name = 'dead'")
    val p = joinPlan(cat)
    assert(p.contains("BroadcastHashJoin"),
      s"DV'd small dim should auto-broadcast:\n$p")
  }

  test("column-mapped snapshot: renamed small dim still auto-broadcasts") {
    val (cat, _) = freshCat("cm")
    spark.sql(s"CREATE TABLE $cat.db.dim (k BIGINT, label STRING)")
    spark.sql(s"INSERT INTO $cat.db.dim VALUES (0,'a'), (1,'b'), (2,'c')")
    spark.sql(s"ALTER TABLE $cat.db.dim RENAME COLUMN label TO name")
    val p = joinPlan(cat)
    assert(p.contains("BroadcastHashJoin"),
      s"column-mapped small dim should auto-broadcast:\n$p")
  }

  test("scan size estimate tracks live file bytes, not defaultSizeInBytes") {
    val (cat, wh) = freshCat("size")
    spark.sql(s"CREATE TABLE $cat.db.dim (k BIGINT, name STRING)")
    spark.sql(s"INSERT INTO $cat.db.dim VALUES (0,'a'), (1,'b'), (2,'c'), (3,'dead')")
    spark.sql(s"DELETE FROM $cat.db.dim WHERE name = 'dead'")
    val stats = spark.table(s"$cat.db.dim")
      .queryExecution.optimizedPlan.stats
    // a few rows of parquet is kilobytes; anything near Long.Max means
    // the estimate fell back to defaultSizeInBytes
    assert(stats.sizeInBytes < BigInt(10L * 1024 * 1024),
      s"size estimate not log-derived: ${stats.sizeInBytes}")
    assert(stats.sizeInBytes > 0, "size estimate must be positive")
  }

  test("sidecar-indexed tables report EXACT row counts to the planner") {
    import spark.implicits._
    val dir = tmpDir("stat_rows")
    (0 to 3).foreach { p =>
      Versioned.append(
        (1L to 25L).map(i => (p * 25L + i, s"n-$i")).toDF("id", "name")
          .coalesce(1), dir)
    }
    Versioned.writeZoneMaps(spark, dir, 4L, Seq("id"))
    // read the relation node's own stats: a residual Filter parent
    // would drop rowCount under default (non-CBO) propagation
    def relRows(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.rowCount
      }.flatten
    val rows = relRows(spark.read.format("graft-versioned").load(dir))
    assert(rows.contains(BigInt(100)),
      s"row count must answer exactly from the sidecar: $rows")
    // a statically pruned read reports the pruned subset's exact rows
    val pruned = relRows(spark.read.format("graft-versioned").load(dir)
      .filter(org.apache.spark.sql.functions.col("id").isin(30L, 31L)))
    assert(pruned.contains(BigInt(25)),
      s"pruned row count must cover the one surviving file: $pruned")
  }
}
