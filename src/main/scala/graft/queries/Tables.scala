package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; with the legacy flag the column reads as epoch-nanos
    // BIGINT — which is also what the determinism contract wants
    // (SURVEY.md §7.4): integer event-time, no sub-micro truncation
    // ambiguity against the DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}

/** One declared engine query: the Spark plan and (when SQL-expressible)
  * its DuckDB oracle over the same parquet tables. `oracle = None` makes
  * the driver record a weaker rows-only check (used for approximate /
  * non-relational operators like LSH ANN).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
