package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.{Column, DataFrame}

/** Cleansing/normalization helpers (reference §2.8 scalar surface).
  *
  * All of these are thin compositions of codegen'd built-ins — they exist
  * to name the reference's recurring idioms, not to replace Catalyst.
  */
object Cleanse {

  /** F1 — `upper(trim(c))` (`02_bronze_to_silver.py:48-49`, `03:44`). */
  def normUpper(c: Column): Column = upper(trim(c))

  /** F2 — `lower(trim(c))` (`02:142`, `02:428-431`). */
  def normLower(c: Column): Column = lower(trim(c))

  /** F3 — `initcap(trim(c))` (`02:815`). */
  def normTitle(c: Column): Column = initcap(trim(c))

  /** F6 — `try_cast`: parse-or-null, never throw (`02:411-425`,
    * `02:713-720`). Corrupt values become NULL and are dropped by the
    * caller's null filter (P10).
    */
  def safeCast(c: Column, to: DataType): Column = c.try_cast(to)

  /** F8 — `try_to_timestamp(c, fmt)` (`02:524-531`, `02:603-623`). */
  def safeTimestamp(c: Column, fmt: String): Column =
    try_to_timestamp(c, lit(fmt))

  /** F9 — default-format variant (`06_gold_fact_reviews.py:35-42`). */
  def safeTimestamp(c: Column): Column = try_to_timestamp(c)

  /** F14 — null-default idiom (`02:434-438`). */
  def withDefault(c: Column, default: Column): Column = coalesce(c, default)

  /** P5/P10 — drop rows where any of `cols` is null (applied after safe
    * casts to reject corrupt rows, `02:415`, `02:534`).
    */
  def dropNullKeys(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
}
