package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Row-level dedup idioms (reference operator W1 / A9).
  *
  * W1 — `row_number() over (partition by K order by ts desc)` + keep row 1
  * is the reference's pervasive latest-record-wins pattern
  * (`02_bronze_to_silver.py:34-41`, `02:172-179`, `02:292-303`,
  * `03_gold_dimensions.py:25-32`, `06_gold_fact_reviews.py:81-90`).
  *
  * A9 — mode-per-group (argmax of a count) is its composite form
  * (`02:164-179`, `03:290-309`).
  *
  * Scale note: both compile to a single hash-partition shuffle on the
  * group keys plus a per-partition sort — the same exchange a
  * groupBy on those keys would need, so there is no avoidable extra
  * shuffle. Skewed keys are handled by AQE; for pathological single-key
  * skew prefer aggregating with max_by when only one payload column is
  * needed.
  */
object Dedup {

  /** A working-column name not present in `df` (deterministic given the
    * schema, so identical subtrees still plan identically and exchange
    * reuse keeps working). Guards against clobbering a real input column
    * that happens to be called `__rn`.
    */
  private[graft] def freshName(df: DataFrame, base: String): String =
    freshName(df.columns.toSeq, base)

  private[graft] def freshName(taken: Seq[String], base: String): String = {
    var n = base
    while (taken.contains(n)) n += "_"
    n
  }

  /** Keep exactly one row per `keys`: the first under `order`.
    * Callers must pass a total order (append a unique tiebreaker column,
    * SURVEY.md §7.4) for deterministic output.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val rn = freshName(df, "__rn")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Mode-per-group (A9): the most frequent `valueCol` per `keys`,
    * ties broken by ascending value for determinism (the reference's
    * `orderBy(desc("count"))` alone is tie-ambiguous).
    * Returns `keys :+ valueCol :+ "n"`.
    */
  def modePerGroup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val counted = df.groupBy((keys :+ valueCol).map(col): _*).agg(count(lit(1)).as("n"))
    val rn = freshName(counted, "__rn")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("n").desc, col(valueCol).asc)
    counted.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Exact duplicate removal by arbitrary key columns: keeps the row with
    * the minimum `idCol` per key group. One shuffle on `keys`.
    */
  def exactByColumns(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    latestByKey(df, keys, Seq(col(idCol).asc))
}
