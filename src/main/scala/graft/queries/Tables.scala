package graft.queries

import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {

  /** Engine-wide contract for the events table: `ts` is epoch-NANOS
    * BIGINT (SURVEY.md §7.4 — integer event time, no truncation
    * ambiguity against the DuckDB oracle). Testdata generations have
    * shipped the column both ways:
    *
    *  - TIMESTAMP(NANOS) parquet — unreadable by Spark 4 unless the
    *    legacy `nanosAsLong` conf is set, under which it surfaces as
    *    epoch-nanos BIGINT directly;
    *  - TIMESTAMP(MICROS) parquet — reads natively as a timestamp
    *    (NTZ when unadjusted), which [[normalizeEventTs]] converts to
    *    the same epoch-nanos BIGINT.
    *
    * Both paths assume/establish a UTC session (Verify/Bench/tests pin
    * `spark.sql.session.timeZone=UTC`), matching DuckDB's treatment of
    * naive timestamps as UTC in `epoch_ns(ts)`.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Rewrites a timestamp-typed `ts` column to epoch-nanos BIGINT (the
    * [[t]] contract); a frame whose `ts` is already integral passes
    * through untouched. NTZ casts to the session zone — UTC by the
    * harness contract — so the wall clock IS the epoch instant, exactly
    * how the DuckDB oracle's `epoch_ns(ts)` reads the same file.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(f => f.name == "ts" &&
        (f.dataType == TimestampType || f.dataType == TimestampNTZType)) match {
      case Some(_) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case None => df
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
