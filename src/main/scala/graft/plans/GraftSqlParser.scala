package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.{Row, SparkSession}

import graft.table.Versioned

/** Delegating SQL parser adding the DDL statements Spark's grammar
  * lacks for this engine — Delta's spellings:
  *
  *   CREATE TABLE [IF NOT EXISTS] <target> [SHALLOW | DEEP] CLONE <source>
  *     [VERSION AS OF <n> | TIMESTAMP AS OF '<ts>']   (bare CLONE = DEEP)
  *   RESTORE TABLE <t> TO {VERSION AS OF <n> | TIMESTAMP AS OF '<ts>'}
  *   OPTIMIZE <t> [WHERE <col> = <lit>] [ZORDER BY (<c1>, <c2>, ...)]
  *   VACUUM <t> [RETAIN <n> HOURS] [DRY RUN]
  *   REORG TABLE <t> APPLY (PURGE)
  *   DESC[RIBE] HISTORY <t> [LIMIT <n>]
  *   DESC[RIBE] DETAIL <t>
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
    GraftSqlParser.parseClone(sqlText, delegate)
      .orElse(GraftSqlParser.parseMaintenance(sqlText, delegate))
      .orElse(GraftSqlParser.parseAlterConstraint(sqlText, delegate))
      .orElse(GraftSqlParser.parseTableProps(sqlText, delegate))
      .orElse(GraftSqlParser.parseCopyInto(sqlText, delegate))
      .getOrElse {
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
  // SHALLOW keeps reference semantics; DEEP — or the bare CLONE,
  // Delta's default — copies the bytes. The optional trailing clause
  // is Delta's time-travel spelling.
  private val CloneStmt =
    ("""(?is)^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(.+?)\s+(?:(SHALLOW|DEEP)\s+)?CLONE\s+(.+?)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)')?\s*;?\s*$""").r

  private[graft] def parseClone(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CloneStmt(ine, target, mode, source, ver, ts)
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
          timestampAsOf = Option(ts),
          deep = mode == null || mode.equalsIgnoreCase("DEEP"))).toOption
      case _ => None
    }

  // ---- Delta's maintenance DDL (statements Spark's grammar lacks) ----
  //
  // RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'
  // OPTIMIZE t [WHERE col = lit] [ZORDER BY (c1, c2, ...)]
  // VACUUM t [RETAIN n HOURS] [DRY RUN]
  // DESC|DESCRIBE HISTORY t
  //
  // None of these keywords begin a valid Spark statement (they are
  // Delta parser extensions), so intercepting by leading keyword has
  // no false-positive surface; a statement that LEADS with one of them
  // but fails the grammar is refused loudly below rather than handed
  // to Spark, whose error would not name the statement at all.

  private val RestoreStmt =
    ("""(?is)^\s*RESTORE\s+TABLE\s+(.+?)\s+TO\s+""" +
      """(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']*)')\s*;?\s*$""").r
  private val OptimizeStmt =
    ("""(?is)^\s*OPTIMIZE\s+(.+?)""" +
      """(?:\s+WHERE\s+([A-Za-z0-9_]+)\s*=\s*('[^']*'|[^\s;]+))?""" +
      """(?:\s+ZORDER\s+BY\s+\(([^)'"]*)\))?\s*;?\s*$""").r
  private val VacuumStmt =
    ("""(?is)^\s*VACUUM\s+(.+?)""" +
      """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val HistoryStmt =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+(.+?)(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""".r
  // DESC[RIBE] DETAIL t — Delta's table-summary DDL
  private val DetailStmt =
    """(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+(.+?)\s*;?\s*$""".r
  // CONVERT TO GRAFT parquet.`/dir` — Delta's CONVERT TO DELTA spelling
  private val ConvertStmt =
    """(?is)^\s*CONVERT\s+TO\s+GRAFT\s+(.+?)\s*;?\s*$""".r
  // REORG TABLE t APPLY (PURGE) — Delta's physical-cleanup rewrite
  private val ReorgStmt =
    """(?is)^\s*REORG\s+TABLE\s+(.+?)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""".r
  // FSCK REPAIR TABLE t [DRY RUN] — Delta's out-of-band-loss repair
  private val FsckStmt =
    """(?is)^\s*FSCK\s+REPAIR\s+TABLE\s+(.+?)(\s+DRY\s+RUN)?\s*;?\s*$""".r
  // ANALYZE TABLE t COMPUTE STATISTICS — row-count stats backfill
  // (legacy-table adoption); FOR [ALL] COLUMNS computes the CBO
  // column statistics (ColStats). Other ANALYZE forms delegate.
  private val AnalyzeStmt =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+(.+?)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+(.+?)))?\s*;?\s*$""").r
  // GENERATE symlink_format_manifest FOR TABLE t — Delta's external-
  // reader manifest
  private val GenerateStmt =
    """(?is)^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+(.+?)\s*;?\s*$""".r
  // CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (c1, c2)
  //   [OPTIONS (fpp = 0.01, itemsPerFile = n)] — Databricks' index DDL
  private val BloomStmt =
    ("""(?is)^\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+(.+?)""" +
      """\s+FOR\s+COLUMNS\s*\(([^)]+)\)""" +
      """(?:\s+OPTIONS\s*\(([^)]+)\))?\s*;?\s*$""").r

  private def cleanIdent(s: String): Boolean =
    !s.exists(c => c == '\'' || c == '"' || c == '(')

  private[graft] def parseMaintenance(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    def ident(s: String): Option[Seq[String]] =
      if (!cleanIdent(s)) None
      else Try(delegate.parseMultipartIdentifier(s)).toOption
    val parsed: Option[LogicalPlan] = sqlText match {
      case RestoreStmt(tbl, ver, ts) =>
        ident(tbl).map(GraftRestoreCommand(_,
          Option(ver).map(_.toLong), Option(ts)))
      case OptimizeStmt(tbl, wcol, wval, zcols) =>
        ident(tbl).map(GraftOptimizeCommand(_,
          Option(zcols).toSeq.flatMap(_.split(',').toSeq)
            .map(_.trim).filter(_.nonEmpty),
          Option(wcol),
          Option(wval).map(v =>
            if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
              v.substring(1, v.length - 1)
            else v)))
      case VacuumStmt(tbl, hours, dry) =>
        ident(tbl).map(GraftVacuumCommand(_,
          Option(hours).map(_.toDouble), dryRun = dry != null))
      case HistoryStmt(tbl, lim) =>
        ident(tbl).map(GraftDescribeHistoryCommand(_, Option(lim).map(_.toInt)))
      case DetailStmt(tbl) =>
        ident(tbl).map(GraftDescribeDetailCommand(_))
      case ConvertStmt(tbl) =>
        ident(tbl).map(GraftConvertCommand(_))
      case ReorgStmt(tbl) =>
        ident(tbl).map(GraftReorgCommand(_))
      case FsckStmt(tbl, dry) =>
        ident(tbl).map(GraftFsckCommand(_, dryRun = dry != null))
      case AnalyzeStmt(tbl, allCols, colList) =>
        if (allCols == null && colList == null)
          ident(tbl).map(GraftAnalyzeCommand(_))
        else {
          val cols = Option(colList).toSeq.flatMap(_.split(',').toSeq)
            .map(_.trim).filter(_.nonEmpty)
          if (cols.exists(c => !cleanIdent(c))) None
          else ident(tbl).map(GraftAnalyzeColumnsCommand(_, cols))
        }
      case GenerateStmt(tbl) =>
        ident(tbl).map(GraftGenerateManifestCommand(_))
      case BloomStmt(tbl, cols, opts) =>
        val optMap = Option(opts).toSeq
          .flatMap(_.split(',').toSeq)
          .map(_.split("=", 2))
          .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
          .toMap
        ident(tbl).map(GraftBloomIndexCommand(_,
          cols.split(',').toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty),
          optMap.get("fpp").map(_.toDouble),
          optMap.get("itemsperfile").map(_.toLong)))
      case _ => None
    }
    if (parsed.isEmpty) {
      // a statement leading with one of OUR keywords cannot be Spark's
      // — refuse with the grammar named (sqlText did not match, or its
      // identifier failed to parse). DESC[RIBE] HISTORY is NOT in this
      // list: `DESCRIBE history` can legitimately describe a table
      // named `history`, so an unmatched DESC always delegates.
      val lead =
        """(?is)^\s*(RESTORE|OPTIMIZE|VACUUM|CONVERT|REORG|FSCK|GENERATE|CREATE\s+BLOOMFILTER)\b""".r
      lead.findFirstIn(sqlText).foreach { _ =>
        throw new IllegalArgumentException(
          "unsupported maintenance statement — supported grammar: " +
            "RESTORE TABLE t TO {VERSION AS OF n | TIMESTAMP AS OF 'ts'}; " +
            "OPTIMIZE t [WHERE col = lit] [ZORDER BY (c1, c2)]; " +
            "VACUUM t [RETAIN n HOURS] [DRY RUN]; " +
            "DESC[RIBE] HISTORY t [LIMIT n]; " +
            "REORG TABLE t APPLY (PURGE); " +
            "FSCK REPAIR TABLE t [DRY RUN]; " +
            "GENERATE symlink_format_manifest FOR TABLE t; " +
            "CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (c1, c2) " +
            "[OPTIONS (fpp = 0.01, itemsPerFile = n)]; " +
            "CONVERT TO GRAFT parquet.`/dir` — where t is a GraftCatalog " +
            s"name or `graft-versioned`.`/table/dir`; got: ${sqlText.trim.take(200)}")
      }
    }
    parsed
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
    if (stripped.matches("""(?is)^\s*CREATE\b.*\b(SHALLOW|DEEP)\s+CLONE\b.*"""))
      throw new IllegalArgumentException(
        "unsupported CLONE statement — the supported grammar is: " +
          "CREATE TABLE [IF NOT EXISTS] <target> [SHALLOW | DEEP] CLONE " +
          "<source> [VERSION AS OF <n> | TIMESTAMP AS OF '<ts>'] where " +
          "each side is a GraftCatalog name or " +
          "`graft-versioned`.`/table/dir` (bare CLONE = DEEP, Delta's " +
          "default; no OR REPLACE, LOCATION, TBLPROPERTIES, or subquery " +
          s"sources); got: ${sqlText.trim.take(200)}")
  }

  // ---- Delta's constraint DDL ----
  //
  // ALTER TABLE t ADD CONSTRAINT name CHECK (expr)
  // ALTER TABLE t DROP CONSTRAINT name
  //
  // ALTER TABLE IS a valid Spark statement lead, so (unlike the
  // maintenance keywords) an unmatched statement always DELEGATES —
  // Spark's own ALTER TABLE grammar (add/drop/rename column, set
  // properties, ...) must keep working. Only the exact two-production
  // constraint shape is intercepted; the name charset is the engine's
  // log-safe constraint grammar, so anything Spark-side (quoted or
  // exotic names) falls through to Spark's error rather than being
  // half-claimed here.

  private val AddConstraintStmt =
    ("""(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+CONSTRAINT\s+""" +
      """([A-Za-z0-9_-]+)\s+CHECK\s*\((.+)\)\s*;?\s*$""").r
  private val DropConstraintStmt =
    """(?is)^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+CONSTRAINT\s+([A-Za-z0-9_-]+)\s*;?\s*$""".r

  private[graft] def parseAlterConstraint(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    def ident(s: String): Option[Seq[String]] =
      if (!cleanIdent(s)) None
      else Try(delegate.parseMultipartIdentifier(s)).toOption
    sqlText match {
      case AddConstraintStmt(tbl, name, cond) =>
        for {
          parts <- ident(tbl)
          // the expression must be Spark-parseable NOW — a shape that
          // matched but carries a broken expression is OUR statement
          // with a bad expression, not Spark's, so let the delegate's
          // ParseException surface from the command at run time; here
          // we only refuse claiming statements whose TABLE slice is
          // not an identifier (those delegate)
        } yield GraftAddConstraintCommand(parts, name, cond.trim)
      case DropConstraintStmt(tbl, name) =>
        ident(tbl).map(GraftDropConstraintCommand(_, name))
      case _ => None
    }
  }

  // ---- TBLPROPERTIES DDL on the PATH form ----
  //
  // Spark's own grammar handles SET/UNSET/SHOW TBLPROPERTIES for
  // catalog-named tables (they route through GraftCatalog.alterTable /
  // VersionedBatchTable.properties), but the `graft-versioned`.`/dir`
  // path form resolves through no catalog — these three intercept
  // EXACTLY that spelling (the backquoted graft-versioned prefix) and
  // delegate everything else, so ordinary tables keep Spark's native
  // behavior.

  private val PathIdent = """`graft-versioned`\s*\.\s*`[^`]+`"""
  private val SetPropsStmt =
    ("""(?is)^\s*ALTER\s+TABLE\s+(""" + PathIdent +
      """)\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*;?\s*$""").r
  private val UnsetPropsStmt =
    ("""(?is)^\s*ALTER\s+TABLE\s+(""" + PathIdent +
      """)\s+UNSET\s+TBLPROPERTIES\s*(IF\s+EXISTS\s*)?\((.*)\)\s*;?\s*$""").r
  private val ShowPropsStmt =
    ("""(?is)^\s*SHOW\s+TBLPROPERTIES\s+(""" + PathIdent +
      """)\s*(?:\(\s*'([^']*)'\s*\))?\s*;?\s*$""").r
  private val PropPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val PropKey = """'([^']*)'""".r

  private[graft] def parseTableProps(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    def ident(s: String): Option[Seq[String]] =
      Try(delegate.parseMultipartIdentifier(s)).toOption
    sqlText match {
      case SetPropsStmt(tbl, body) =>
        val props = PropPair.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2)).toMap
        if (props.isEmpty) None
        else ident(tbl).map(GraftSetPropertiesCommand(_, props))
      case UnsetPropsStmt(tbl, ife, body) =>
        val keys = PropKey.findAllMatchIn(body).map(_.group(1)).toSeq
        if (keys.isEmpty) None
        else ident(tbl).map(GraftUnsetPropertiesCommand(_, keys, ife != null))
      case ShowPropsStmt(tbl, key) =>
        ident(tbl).map(GraftShowPropertiesCommand(_, Option(key)))
      case _ => None
    }
  }

  // ---- COPY INTO (Databricks' idempotent bulk-load statement) ----
  //
  // COPY INTO t FROM '/src/dir' FILEFORMAT = PARQUET|CSV|JSON
  //   [FORMAT_OPTIONS ('k' = 'v', ...)] [COPY_OPTIONS ('force' = 'true')]
  //
  // COPY does not begin any valid Spark statement, so interception by
  // leading keyword has no false-positive surface; a statement that
  // LEADS with COPY but fails the grammar is refused loudly with the
  // supported form named (same policy as the maintenance keywords).

  private val CopyIntoStmt =
    ("""(?is)^\s*COPY\s+INTO\s+(.+?)\s+FROM\s+'([^']+)'\s+""" +
      """FILEFORMAT\s*=\s*([A-Za-z]+)""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r

  private val OptionPair = """'([^']*)'\s*=\s*'([^']*)'""".r

  private def parseOptionList(s: String): Map[String, String] =
    if (s == null || s.trim.isEmpty) Map.empty
    else OptionPair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap

  private[graft] def parseCopyInto(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    val parsed: Option[LogicalPlan] = sqlText match {
      case CopyIntoStmt(tbl, src, fmt, fmtOpts, copyOpts)
          if cleanIdent(tbl) &&
            Seq("parquet", "csv", "json").contains(fmt.toLowerCase(java.util.Locale.ROOT)) =>
        Try(delegate.parseMultipartIdentifier(tbl)).toOption.map { parts =>
          GraftCopyIntoCommand(parts, src,
            fmt.toLowerCase(java.util.Locale.ROOT),
            parseOptionList(fmtOpts), parseOptionList(copyOpts))
        }
      case _ => None
    }
    if (parsed.isEmpty) {
      """(?is)^\s*COPY\b""".r.findFirstIn(sqlText).foreach { _ =>
        throw new IllegalArgumentException(
          "unsupported COPY statement — supported grammar: " +
            "COPY INTO t FROM '/src/path' FILEFORMAT = {PARQUET|CSV|JSON} " +
            "[FORMAT_OPTIONS ('k' = 'v', ...)] " +
            "[COPY_OPTIONS ('force' = 'true')] — where t is a GraftCatalog " +
            s"name or `graft-versioned`.`/table/dir`; got: ${sqlText.trim.take(200)}")
      }
    }
    parsed
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
    versionAsOf: Option[Long] = None, timestampAsOf: Option[String] = None,
    deep: Boolean = false)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val what = if (deep) "CLONE" else "SHALLOW CLONE"
    val dst = GraftDdl.dirOf(spark, targetParts, s"$what target")
    val src = GraftDdl.dirOf(spark, sourceParts, s"$what source")
    val pinned = versionAsOf.orElse(timestampAsOf.map(t =>
      Versioned.versionAsOf(spark, src, Versioned.parseTimestampMillis(t))))
    Versioned.currentVersion(spark, dst) match {
      case Some(v) if ifNotExists => Seq(Row(v)) // already a table: no-op
      case _ => Seq(Row(Versioned.cloneTable(spark, src, dst, pinned, deep = deep)))
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCloneCommand${if (deep) " DEEP" else ""} " +
      s"${targetParts.mkString(".")} <- ${sourceParts.mkString(".")}" +
      versionAsOf.map(v => s" VERSION AS OF $v").getOrElse("") +
      timestampAsOf.map(t => s" TIMESTAMP AS OF '$t'").getOrElse("")
}

/** Shared identifier resolution for the graft DDL commands: a
  * GraftCatalog name (`cat.ns.t`) or the explicit path form
  * (`graft-versioned`.`/table/dir`), resolved at RUN time because
  * catalogs register lazily via session conf.
  */
private[plans] object GraftDdl {
  def dirOf(spark: SparkSession, parts: Seq[String], what: String): String =
    parts match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("graft-versioned") => path
      case _ => Bridge.graftCatalogTableDir(spark, parts).getOrElse(
        throw new IllegalArgumentException(
          s"$what ${parts.mkString(".")} is neither a " +
            "GraftCatalog name nor a `graft-versioned`.`path` identifier"))
    }
}

/** `RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts'` —
  * Delta's restore DDL, delegating to the same committed
  * [[Versioned.restore]]/[[Versioned.restoreAsOf]] code path
  * `CALL system.restore`/`system.restore_asof` run. Returns the new
  * head version the restore commit published.
  */
final case class GraftRestoreCommand(
    tableParts: Seq[String], versionAsOf: Option[Long],
    timestampAsOf: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "RESTORE TABLE")
    val v = versionAsOf match {
      case Some(n) => Versioned.restore(spark, dir, n)
      case None => Versioned.restoreAsOf(spark, dir,
        Versioned.parseTimestampMillis(timestampAsOf.get))
    }
    Seq(Row(v))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftRestoreCommand ${tableParts.mkString(".")}"
}

/** `OPTIMIZE t [ZORDER BY (c1, c2)]` — Delta's maintenance DDL. The
  * plain form bin-packs small files ([[Versioned.compactSmall]],
  * Delta's default OPTIMIZE); the ZORDER form rewrites clustered on
  * the interleaved bits ([[Versioned.optimizeZOrderBy]]). Returns the
  * committed version — the prior head when there was nothing to
  * compact (Delta's zero-metrics no-op).
  */
final case class GraftOptimizeCommand(
    tableParts: Seq[String], zorderBy: Seq[String],
    whereCol: Option[String] = None, whereVal: Option[String] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "OPTIMIZE")
    def head = Versioned.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $dir"))
    val v = whereCol match {
      case Some(c) =>
        // partition/zone-scoped bin-pack (Delta's OPTIMIZE t WHERE pred);
        // clustering maintenance has its own incremental entry
        require(zorderBy.isEmpty,
          "OPTIMIZE WHERE composes with bin-packing only — incremental " +
            "clustering is CALL system.zorder_incremental")
        Versioned.compactSmallWhere(spark, dir, c, whereVal.get)
          .getOrElse(head)
      case None =>
        val bucketed = Versioned.bucketSpecAt(spark, dir, head)
        val declared = Versioned.clusterByAt(spark, dir, head)
        if (bucketed.isDefined) {
          // bucket layout is the ONE authority: bare OPTIMIZE bin-packs
          // WITHIN buckets (compactSmall routes through the bucketed
          // writer) and re-tags any untagged rewrite tail; an explicit
          // ZORDER BY would strip the tags
          require(zorderBy.isEmpty,
            s"table declares a bucket layout (${Versioned.BucketByKey}) — " +
              "bare OPTIMIZE maintains it (within-bucket bin-pack + " +
              "re-tag); range clustering would strip the bucket tags")
          val compacted = Versioned.compactSmall(spark, dir)
          Versioned.rebucket(spark, dir)
            .orElse(compacted).getOrElse(head)
        }
        else if (declared.nonEmpty) {
          // a CLUSTER BY table has ONE layout authority: bare OPTIMIZE
          // maintains the declared keys INCREMENTALLY (only the
          // unclustered tail rewrites — the 100 TB maintenance shape);
          // an explicit ZORDER BY would silently fork the layout
          require(zorderBy.isEmpty,
            s"table declares CLUSTER BY (${declared.mkString(", ")}) — " +
              "bare OPTIMIZE maintains it; change keys with " +
              "ALTER TABLE ... CLUSTER BY, or CLUSTER BY NONE first")
          Versioned.zorderIncremental(spark, dir, declared).getOrElse(head)
        }
        else if (zorderBy.nonEmpty) Versioned.optimizeZOrderBy(spark, dir, zorderBy)
        else Versioned.compactSmall(spark, dir).getOrElse(head)
    }
    Seq(Row(v))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftOptimizeCommand ${tableParts.mkString(".")}" +
      whereCol.map(c => s" WHERE $c = ${whereVal.getOrElse("")}").getOrElse("") +
      (if (zorderBy.nonEmpty) zorderBy.mkString(" ZORDER BY (", ", ", ")") else "")
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` — Delta's vacuum DDL over the
  * engine's age-based sweep ([[Versioned.vacuumRetain]]): keeps every
  * version committed inside the window plus the head. RETAIN defaults
  * to Delta's 168 hours; DRY RUN lists the candidates without
  * deleting. Returns one row per removed (or would-remove) path.
  */
final case class GraftVacuumCommand(
    tableParts: Seq[String], retainHours: Option[Double], dryRun: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("removed_path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "VACUUM")
    // RETAIN default: the table's graft.vacuum.retainHours property
    // when set, else Delta's 168 hours
    val hours = retainHours.orElse(
      Versioned.currentVersion(spark, dir)
        .flatMap(v => Versioned.propertiesAt(spark, dir, v)
          .get("graft.vacuum.retainHours"))
        .flatMap(s => Try(s.toDouble).toOption).filter(_ >= 0))
      .getOrElse(168.0)
    val ms = (hours * 3600000L).toLong
    Versioned.vacuumRetain(spark, dir, ms, dryRun = dryRun).map(Row(_))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftVacuumCommand ${tableParts.mkString(".")}" + (if (dryRun) " DRY RUN" else "")
}

/** `FSCK REPAIR TABLE t [DRY RUN]` — Delta's repair of the same name
  * over [[Versioned.fsckRepair]]: drops log references to data files
  * deleted out-of-band (distributed existence probe; the commit is a
  * logged, row-mutating data-loss acknowledgment). Returns one row per
  * missing file; DRY RUN lists without committing.
  */
final case class GraftFsckCommand(tableParts: Seq[String], dryRun: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("missing_path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "FSCK REPAIR TABLE")
    Versioned.fsckRepair(spark, dir, dryRun = dryRun).map(Row(_))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftFsckCommand ${tableParts.mkString(".")}" + (if (dryRun) " DRY RUN" else "")
}

/** `CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (…)` — Databricks'
  * index DDL over [[Versioned.buildBloom]]: one distributed pass blooms
  * the head snapshot's files for equality-probe data skipping
  * ([[graft.table.Bloom]]). Returns the indexed version.
  */
final case class GraftBloomIndexCommand(
    tableParts: Seq[String], cols: Seq[String],
    fpp: Option[Double], itemsPerFile: Option[Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("indexed_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "CREATE BLOOMFILTER INDEX")
    Seq(Row(Versioned.buildBloom(spark, dir, cols,
      fpp.getOrElse(0.01), itemsPerFile.getOrElse(1000000L))))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftBloomIndexCommand ${tableParts.mkString(".")} (${cols.mkString(",")})"
}

/** `ANALYZE TABLE t COMPUTE STATISTICS` — the stats-backfill spelling
  * over [[Versioned.analyzeTable]]: counts every live head file the
  * row-stats sidecar does not cover yet (one explicit O(snapshot)
  * footer pass — the legacy-table adoption path; tables born after the
  * discipline stat incrementally at write and backfill zero files).
  * Richer ANALYZE forms (FOR COLUMNS, PARTITION, NOSCAN) delegate to
  * Spark's parser untouched.
  */
final case class GraftAnalyzeCommand(tableParts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_statted", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ANALYZE TABLE")
    val (v, n) = Versioned.analyzeTable(spark, dir)
    Seq(Row(v, n))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftAnalyzeCommand ${tableParts.mkString(".")}"
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [c1, …]` —
  * the CBO stats pass over [[Versioned.analyzeColumns]]: one
  * distributed aggregate computes per-column NDV/nulls/min/max/string
  * lengths and publishes the colstats sidecar every DSv2 scan then
  * reports to the planner (`Statistics.columnStats()` →
  * `spark.sql.cbo.enabled` estimation and join reorder). Empty `cols`
  * = ALL COLUMNS.
  */
final case class GraftAnalyzeColumnsCommand(
    tableParts: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("columns_analyzed", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ANALYZE TABLE FOR COLUMNS")
    val (v, n) = Versioned.analyzeColumns(spark, dir, cols)
    Seq(Row(v, n))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftAnalyzeColumnsCommand ${tableParts.mkString(".")} (${cols.mkString(",")})"
}

/** `GENERATE symlink_format_manifest FOR TABLE t` — Delta's command of
  * the same name over [[Versioned.generateManifest]]: publishes the
  * current snapshot's file list as `_symlink_format_manifest/…/manifest`
  * text files for engines without a log reader (Presto/Trino/Athena).
  * Returns one row per manifest written. Refused on DV-bearing or
  * column-mapped snapshots (raw parquet ≠ logical table there).
  */
final case class GraftGenerateManifestCommand(tableParts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("manifest_path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "GENERATE symlink_format_manifest")
    Versioned.generateManifest(spark, dir).map(Row(_))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftGenerateManifestCommand ${tableParts.mkString(".")}"
}

/** `CONVERT TO GRAFT parquet.`/dir`` — Delta's `CONVERT TO DELTA`
  * spelling: registers an existing plain-parquet directory as a
  * versioned table IN PLACE ([[Versioned.convert]] — zero bytes
  * copied; flat part-files are renamed into a `d-convert-*` subdir for
  * the engine's two-segment file identity; hive-partitioned layouts
  * refuse loudly). Accepts `parquet.`path`` (Delta's form) or a
  * GraftCatalog name whose warehouse directory already holds the
  * files. Returns the published v1.
  */
final case class GraftConvertCommand(tableParts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = tableParts match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("parquet") => path
      case _ => GraftDdl.dirOf(spark, tableParts, "CONVERT TO GRAFT")
    }
    Seq(Row(Versioned.convert(spark, dir)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftConvertCommand ${tableParts.mkString(".")}"
}

/** `REORG TABLE t APPLY (PURGE)` — Delta's physical-cleanup DDL over
  * [[Versioned.reorgPurge]]: rewrites exactly the files carrying
  * deletion vectors (soft-deleted bytes materialized away) or written
  * before the latest DROP COLUMN (retired physical columns purged),
  * leaving clean files untouched. Row content is unchanged, so the
  * commit is skippable maintenance like OPTIMIZE. Returns the committed
  * version, or the current head when nothing needed purging (Delta's
  * no-op REORG also succeeds).
  */
final case class GraftReorgCommand(tableParts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "REORG TABLE")
    val v = Versioned.reorgPurge(spark, dir).getOrElse(
      Versioned.currentVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $dir")))
    Seq(Row(v))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftReorgCommand ${tableParts.mkString(".")}"
}

/** `DESC[RIBE] HISTORY t [LIMIT n]` — Delta's history DDL: one row per
  * retained version (version, op, commit_ts, n_files), the same
  * log-sized walk `CALL system.history` serves. With LIMIT n only the
  * NEWEST n commits are read — O(n + CheckpointInterval) log entries,
  * Delta's `history(limit)` — so a monitoring query over a year-old
  * streamed table never replays its whole log. Note Delta's own
  * shadowing rule: a table literally named `history` must be
  * backquoted to DESCRIBE it as a table.
  */
final case class GraftDescribeHistoryCommand(
    tableParts: Seq[String], limit: Option[Int] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("commit_ts", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "DESCRIBE HISTORY")
    limit match {
      case Some(n) => Versioned.history(spark, dir, n).collect().toSeq
      case None => Versioned.history(spark, dir).collect().toSeq
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDescribeHistoryCommand ${tableParts.mkString(".")}"
}

/** `DESC[RIBE] DETAIL t` — Delta's table-summary DDL over
  * [[Versioned.detail]]: ONE row for the current snapshot (version,
  * commit time, file count, total bytes, soft-deleted positions,
  * metadata row count when the stats sidecar covers the snapshot,
  * constraint names, and the declared CLUSTER BY / bucket layouts).
  * Log-and-listing cost only — no data file is opened. Delta's
  * shadowing rule applies as with HISTORY: a table literally named
  * `detail` must be backquoted to DESCRIBE it as a table.
  */
final case class GraftDescribeDetailCommand(tableParts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_ts", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("n_soft_deleted", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("constraints",
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = false),
      nullable = false)(),
    AttributeReference("clustering", StringType, nullable = false)(),
    AttributeReference("bucket_spec", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "DESCRIBE DETAIL")
    Versioned.detail(spark, dir).collect().toSeq
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDescribeDetailCommand ${tableParts.mkString(".")}"
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — Delta's
  * constraint DDL over [[Versioned.addConstraint]]: the CURRENT
  * snapshot is validated first (a constraint the table already
  * violates is refused), then the named CHECK commits to the log and
  * every subsequent append/merge/update enforces it. Same path as
  * `CALL system.add_constraint`. Returns the committed version.
  */
final case class GraftAddConstraintCommand(
    tableParts: Seq[String], name: String, condSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ALTER TABLE ADD CONSTRAINT")
    Seq(Row(Versioned.addConstraint(spark, dir, name, condSql)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftAddConstraintCommand ${tableParts.mkString(".")} $name CHECK ($condSql)"
}

/** `ALTER TABLE t DROP CONSTRAINT name` — drops the named CHECK
  * constraint ([[Versioned.dropConstraint]]). Returns the committed
  * version.
  */
final case class GraftDropConstraintCommand(
    tableParts: Seq[String], name: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ALTER TABLE DROP CONSTRAINT")
    Seq(Row(Versioned.dropConstraint(spark, dir, name)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDropConstraintCommand ${tableParts.mkString(".")} $name"
}

/** `ALTER TABLE `graft-versioned`.`/dir` SET TBLPROPERTIES ('k'='v', …)`
  * — the path-form spelling of [[Versioned.setProperties]]: one
  * metadata-only commit carrying the updated property map. Catalog
  * names take Spark's native grammar into `GraftCatalog.alterTable`;
  * both roads run the same commit.
  */
final case class GraftSetPropertiesCommand(
    tableParts: Seq[String], props: Map[String, String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ALTER TABLE SET TBLPROPERTIES")
    Seq(Row(Versioned.setProperties(spark, dir, props)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftSetPropertiesCommand ${tableParts.mkString(".")} " +
      props.keys.toSeq.sorted.mkString("(", ", ", ")")
}

/** `ALTER TABLE `graft-versioned`.`/dir` UNSET TBLPROPERTIES
  * [IF EXISTS] ('k', …)` — the path-form spelling of
  * [[Versioned.unsetProperties]]; unknown keys refuse loudly unless
  * IF EXISTS (Delta's convention).
  */
final case class GraftUnsetPropertiesCommand(
    tableParts: Seq[String], keys: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "ALTER TABLE UNSET TBLPROPERTIES")
    Seq(Row(Versioned.unsetProperties(spark, dir, keys, ifExists)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftUnsetPropertiesCommand ${tableParts.mkString(".")} " +
      keys.mkString("(", ", ", ")") + (if (ifExists) " IF EXISTS" else "")
}

/** `SHOW TBLPROPERTIES `graft-versioned`.`/dir` [('key')]` — the
  * path-form property listing: one (key, value) row per property of
  * the head snapshot, or just the asked-for key (no rows when absent).
  */
final case class GraftShowPropertiesCommand(
    tableParts: Seq[String], key: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "SHOW TBLPROPERTIES")
    val head = Versioned.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $dir"))
    val props = Versioned.propertiesAt(spark, dir, head)
    key match {
      case Some(k) => props.get(k).map(v => Row(k, v)).toSeq
      case None => props.toSeq.sorted.map { case (k, v) => Row(k, v) }
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftShowPropertiesCommand ${tableParts.mkString(".")}" +
      key.map(k => s" ('$k')").getOrElse("")
}

/** `COPY INTO t FROM '/src' FILEFORMAT = fmt [FORMAT_OPTIONS (...)]
  * [COPY_OPTIONS ('force' = 'true')]` — Databricks' idempotent
  * bulk-load statement over [[Versioned.copyInto]]: source files
  * already loaded into the table (identity path|length, recorded in
  * the commit log) are skipped, so re-running the statement after a
  * partial failure or on a growing landing directory loads exactly
  * the new files. `force` reloads everything regardless. Returns
  * (version, num_loaded_files) — the Databricks result-shape analog.
  */
final case class GraftCopyIntoCommand(
    tableParts: Seq[String], srcPath: String, format: String,
    formatOptions: Map[String, String], copyOptions: Map[String, String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_loaded_files", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.dirOf(spark, tableParts, "COPY INTO")
    val force = copyOptions.get("force").exists(_.equalsIgnoreCase("true"))
    val unknown = copyOptions.keySet - "force"
    require(unknown.isEmpty,
      s"unsupported COPY_OPTIONS: ${unknown.mkString(", ")} (supported: force)")
    val (v, n) = Versioned.copyInto(spark, dir, srcPath, format, formatOptions, force)
    Seq(Row(v, n))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCopyIntoCommand ${tableParts.mkString(".")} <- $srcPath ($format)"
}
