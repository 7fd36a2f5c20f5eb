package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Core, Extensions, LakeQueries, QueryDef, StreamingQueries, Temporal, VersionedQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * named query; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-compare (queries without SQL-expressible semantics get a
  * rows-only check).
  */
object SparkEntry {

  private def defs: Seq[QueryDef] =
    Core.all ++ Temporal.all ++ StreamingQueries.all ++ VersionedQueries.all ++
      LakeQueries.all ++ Extensions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.revenueRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
