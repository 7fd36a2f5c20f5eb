package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridges `graft.plans` Catalyst expressions into the public `Column`
  * API. Spark 4.x hides `Column(expr)` behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this shim lives in a
  * subpackage of `org.apache.spark.sql` solely to re-export the two
  * conversions — the standard technique for libraries shipping custom
  * expressions without a session-level function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` re-export (`private[sql]`): builds an analyzed
    * DataFrame from a logical plan — how the SQL MERGE command turns
    * its captured source plan back into the `Versioned.merge` input.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Registers a SQL function on a LIVE session (the
    * `spark.sql.extensions` class only applies while a session is being
    * built); `sessionState` is `private[sql]`, hence this shim.
    */
  def registerFunction(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Registers a TABLE-VALUED function on a LIVE session (same
    * rationale as [[registerFunction]]; the builder returns a resolved
    * LogicalPlan instead of an Expression).
    */
  def registerTableFunction(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(id, info, builder)

  /** Resolves a multipart identifier whose head names a registered
    * [[GraftCatalog]] to that catalog's table directory — how the SQL
    * MERGE extension rule claims `MERGE INTO cat.ns.t` targets.
    * `CatalogManager` is `private[sql]`, hence this shim. Returns None
    * for identifiers not rooted in a GraftCatalog (including the
    * not-registered and too-short cases), leaving them to normal
    * resolution.
    */
  def graftCatalogTableDir(
      spark: SparkSession, parts: Seq[String]): Option[String] = {
    if (parts.length < 2) None
    else {
      val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalogManager
      if (!cm.isCatalogRegistered(parts.head)) None
      else cm.catalog(parts.head) match {
        case g: GraftCatalog =>
          Some(g.tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.tail.init.toArray, parts.last)))
        case _ => None
      }
    }
  }
}
