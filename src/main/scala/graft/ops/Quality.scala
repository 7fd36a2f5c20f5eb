package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality expectations — the Delta CHECK-constraint /
  * DLT-expectations analog for the silver layer. The reference enforces
  * quality imperatively (per-column try_cast + null drops,
  * `02_bronze_to_silver.py:411-425`); this names the rules once and
  * derives flagging, quarantine routing, and per-rule metrics from the
  * single definition, so the numbers reported are provably the rules
  * enforced.
  *
  * Scale shape: every product is ONE narrow projection or one map-side
  * aggregate over the input — rules are plain Catalyst boolean columns
  * (codegen'd, pushdown-friendly), never UDFs, and the metrics
  * aggregate shuffles exactly one row per rule set, not per key.
  */
object Quality {

  /** One named expectation: `cond` must evaluate TRUE for a row to
    * pass. A NULL cond (e.g. a comparison over a NULL column) is a
    * FAILURE, not a pass — SQL CHECK semantics would let NULL through,
    * but for pipeline quality gates an unevaluable rule is a dirty row.
    */
  final case class Rule(name: String, cond: Column) {
    def passes: Column = coalesce(cond, lit(false))
  }

  private def violationsArray(rules: Seq[Rule]): Column =
    filter(
      array(rules.map(r => when(!r.passes, lit(r.name))): _*),
      v => v.isNotNull)

  /** Adds `_violations`: the (possibly empty) array of failed rule
    * names per row. The audit form — keeps every row, names every
    * problem, one projection.
    */
  def flag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    df.withColumn("_violations", violationsArray(rules))
  }

  /** Routes rows: (clean, quarantine). Quarantined rows carry
    * `_violations` for triage; clean rows keep the input schema
    * untouched. Two filters over one flagged projection — Catalyst
    * collapses the shared scan when both sides are consumed in one
    * action, and at scale each side is a straight filter-pushdown scan.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = flag(df, rules)
    (flagged.filter(size(col("_violations")) === 0).drop("_violations"),
      flagged.filter(size(col("_violations")) > 0))
  }

  /** Per-rule metrics: one row per rule with pass/fail counts and the
    * failure rate. A map-side aggregate of booleans — the whole report
    * costs one scan regardless of rule count.
    */
  def summary(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val n = count(lit(1))
    // rule names are user text: resolve the generated columns through
    // backtick-quoted refs so a dot (or other column-path syntax) in a
    // name can't be parsed as a nested-field reference
    def fCol(r: Rule) = col(s"`__f_${r.name.replace("`", "``")}`")
    val agg = df.agg(
      n.as("n_rows"),
      rules.map(r => sum(when(r.passes, 0L).otherwise(1L)).as(s"__f_${r.name}")): _*)
    // one input row per rule: unpivot the single aggregate row
    val perRule = rules.map(r =>
      struct(lit(r.name).as("rule"), fCol(r).as("n_fail")))
    agg.select(col("n_rows"), explode(array(perRule: _*)).as("r"))
      .select(
        col("r.rule").as("rule"),
        col("n_rows"),
        col("r.n_fail").as("n_fail"),
        (col("r.n_fail") / col("n_rows")).as("fail_rate"))
  }
}
