package graft.plans

import scala.util.Try

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
  *     [VERSION AS OF <n> | TIMESTAMP AS OF '<ts>']
  *
  * where either side is a GraftCatalog name (`cat.ns.t`) or the path
  * form (`graft-versioned`.`/table/dir`), and the optional time-travel
  * clause forks a historical snapshot instead of the head (the pin
  * sidecar protects that version's files from source-side vacuum).
  * Everything else — including anything that merely *contains* the
  * keyword inside a string literal, a comment, or a CTAS query —
  * passes through to Spark's parser verbatim. A statement that IS a
  * shallow clone (keyword present outside literals/comments) but uses
  * a clause this grammar doesn't support (`CREATE OR REPLACE`,
  * `LOCATION`, a subquery source) is REFUSED loudly with the supported
  * grammar named, instead of falling through to Spark's parser whose
  * error would never mention clone. A hand-rolled single statement
  * beats forking the ANTLR grammar for one production: the statement
  * has no expression positions, only two identifiers the DELEGATE
  * parses (so backquoting, dots, and case rules stay Spark's).
  *
  * The statement is sugar over [[Versioned.cloneTable]] — the same pin
  * + re-verify + metadata-carry commit `CALL system.clone` runs.
  */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseClone(sqlText, delegate).getOrElse {
      GraftSqlParser.refuseUnsupportedClone(sqlText)
      delegate.parsePlan(sqlText)
    }

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
  // quote or paren (a CTAS/string-literal false positive, not a clone).
  // The optional trailing clause is Delta's time-travel spelling.
  private val CloneStmt =
    ("""(?is)^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(.+?)\s+SHALLOW\s+CLONE\s+(.+?)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)')?\s*;?\s*$""").r

  private[graft] def parseClone(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CloneStmt(ine, target, source, ver, ts)
          if !Seq(target, source).exists(s =>
            s.exists(c => c == '\'' || c == '"' || c == '(')) =>
        // an identifier slice the delegate cannot parse means the match
        // was a false positive (e.g. the keyword inside a comment with
        // clean surroundings) — fall through rather than propagate the
        // delegate's mid-statement ParseException
        (for {
          tgt <- Try(delegate.parseMultipartIdentifier(target))
          src <- Try(delegate.parseMultipartIdentifier(source))
        } yield GraftCloneCommand(tgt, src, ifNotExists = ine != null,
          versionAsOf = Option(ver).map(_.toLong),
          timestampAsOf = Option(ts))).toOption
      case _ => None
    }

  /** Statements that ARE a shallow clone (the keyword survives literal
    * + comment stripping inside a CREATE statement) but did not parse
    * above use a clause this grammar does not support — refuse with
    * the supported form named, instead of delegating to Spark whose
    * error will not mention clone at all.
    */
  private[graft] def refuseUnsupportedClone(sqlText: String): Unit = {
    val stripped = sqlText
      .replaceAll("(?s)/\\*.*?\\*/", " ") // bracketed comments
      .replaceAll("--[^\n]*", " ")        // line comments
      .replaceAll("'[^']*'", " ")         // string literals
      .replaceAll("\"[^\"]*\"", " ")      // double-quoted literals
      .replaceAll("`[^`]*`", " ")         // backquoted identifiers
    if (stripped.matches("""(?is)^\s*CREATE\b.*\bSHALLOW\s+CLONE\b.*"""))
      throw new IllegalArgumentException(
        "unsupported SHALLOW CLONE statement — the supported grammar is: " +
          "CREATE TABLE [IF NOT EXISTS] <target> SHALLOW CLONE <source> " +
          "[VERSION AS OF <n> | TIMESTAMP AS OF '<ts>'] where each side " +
          "is a GraftCatalog name or `graft-versioned`.`/table/dir` " +
          "(no OR REPLACE, LOCATION, TBLPROPERTIES, or subquery sources); " +
          s"got: ${sqlText.trim.take(200)}")
  }
}

/** `CREATE TABLE t SHALLOW CLONE s [VERSION|TIMESTAMP AS OF …]` —
  * resolves both identifiers (a GraftCatalog name or the
  * `graft-versioned`.`path` form) at RUN time (catalogs register
  * lazily via session conf), resolves the optional time-travel bound
  * against the SOURCE's commit-timestamp index, and forwards to
  * [[Versioned.cloneTable]]. Returns the clone's committed version;
  * IF NOT EXISTS turns an already-a-table target into a no-op row.
  */
final case class GraftCloneCommand(
    targetParts: Seq[String], sourceParts: Seq[String], ifNotExists: Boolean,
    versionAsOf: Option[Long] = None, timestampAsOf: Option[String] = None)
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
    val pinned = versionAsOf.orElse(timestampAsOf.map(t =>
      Versioned.versionAsOf(spark, src, Versioned.parseTimestampMillis(t))))
    Versioned.currentVersion(spark, dst) match {
      case Some(v) if ifNotExists => Seq(Row(v)) // already a table: no-op
      case _ => Seq(Row(Versioned.cloneTable(spark, src, dst, pinned)))
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCloneCommand ${targetParts.mkString(".")} <- ${sourceParts.mkString(".")}" +
      versionAsOf.map(v => s" VERSION AS OF $v").getOrElse("") +
      timestampAsOf.map(t => s" TIMESTAMP AS OF '$t'").getOrElse("")
}
