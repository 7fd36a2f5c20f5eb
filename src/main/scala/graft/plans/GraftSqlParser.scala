package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.{Row, SparkSession}

import graft.table.Versioned

/** Delegating SQL parser adding the one DDL statement Spark's grammar
  * lacks for this engine — Delta's shallow-clone spelling:
  *
  *   CREATE TABLE [IF NOT EXISTS] <target> SHALLOW CLONE <source>
  *
  * where either side is a GraftCatalog name (`cat.ns.t`) or the path
  * form (`graft-versioned`.`/table/dir`). Everything else — including
  * anything that merely *contains* the keyword inside a string literal
  * or a CTAS query (detected by a quote/paren before the keyword) —
  * passes through to Spark's parser verbatim. A hand-rolled single
  * statement beats forking the ANTLR grammar for one production: the
  * statement has no expression positions, only two identifiers the
  * DELEGATE parses (so backquoting, dots, and case rules stay Spark's).
  *
  * The statement is sugar over [[Versioned.cloneTable]] — the same pin
  * + re-verify + metadata-carry commit `CALL system.clone` runs.
  */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseClone(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // lazy identifier groups; the guards below reject anything holding a
  // quote or paren (a CTAS/string-literal false positive, not a clone)
  private val CloneStmt =
    """(?is)^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(.+?)\s+SHALLOW\s+CLONE\s+(.+?)\s*;?\s*$""".r

  private[graft] def parseClone(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CloneStmt(ine, target, source)
          if !Seq(target, source).exists(s =>
            s.exists(c => c == '\'' || c == '"' || c == '(')) =>
        Some(GraftCloneCommand(
          delegate.parseMultipartIdentifier(target),
          delegate.parseMultipartIdentifier(source),
          ifNotExists = ine != null))
      case _ => None
    }
}

/** `CREATE TABLE t SHALLOW CLONE s` — resolves both identifiers (a
  * GraftCatalog name or the `graft-versioned`.`path` form) at RUN time
  * (catalogs register lazily via session conf) and forwards to
  * [[Versioned.cloneTable]]. Returns the clone's committed version;
  * IF NOT EXISTS turns an already-a-table target into a no-op row.
  */
final case class GraftCloneCommand(
    targetParts: Seq[String], sourceParts: Seq[String], ifNotExists: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  private def dirOf(spark: SparkSession, parts: Seq[String], role: String): String =
    parts match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("graft-versioned") => path
      case _ => Bridge.graftCatalogTableDir(spark, parts).getOrElse(
        throw new IllegalArgumentException(
          s"SHALLOW CLONE $role ${parts.mkString(".")} is neither a " +
            "GraftCatalog name nor a `graft-versioned`.`path` identifier"))
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val dst = dirOf(spark, targetParts, "target")
    val src = dirOf(spark, sourceParts, "source")
    Versioned.currentVersion(spark, dst) match {
      case Some(v) if ifNotExists => Seq(Row(v)) // already a table: no-op
      case _ => Seq(Row(Versioned.cloneTable(spark, src, dst)))
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCloneCommand ${targetParts.mkString(".")} <- ${sourceParts.mkString(".")}"
}
