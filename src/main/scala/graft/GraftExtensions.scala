package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

import graft.plans.{DotProduct, IntersectSize, KMinValues, MinHashSig, PolyHash, WordShingles}

/** SQL surface of the engine's fused expressions — the standard library
  * extension mechanism (`SparkSessionExtensions`), so a pure-SQL user
  * gets the same codegen'd operators the Scala API uses:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (at session build), or
  *   GraftExtensions.register(spark)              (on a live session)
  *
  * then e.g.
  *   SELECT graft_polyhash(text)             AS fingerprint,
  *          graft_word_shingles(text, 3)     AS shingles,
  *          graft_minhash_sig(hashes, 128)   AS sig,
  *          graft_dot(a, b)                  AS dot,
  *          graft_intersect_size(sa, sb)     AS shared
  *
  * Width/base arguments must be integer literals: they parameterize the
  * generated expression tree (a MinHash signature width is plan
  * structure, not data).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    // the one statement Spark's grammar lacks: CREATE TABLE ... SHALLOW
    // CLONE (sugar over Versioned.cloneTable; everything else delegates)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // hint-resolution batch, NOT the resolution batch: the built-in
    // ResolveSQLOnFile fails fast on `format`.`path` relations whose
    // format is a non-file DSv2 provider, and it runs before extended
    // resolution rules would — so this rule must fire in the earlier
    // Hints batch to claim `graft-versioned`.`...` relations first
    ext.injectHintResolutionRule(session =>
      new ResolveGraftVersionedRelation(session.asInstanceOf[SparkSession]))
  }
}

/** Pure-SQL entry to versioned tables — resolves
  *
  *   SELECT ... FROM `graft-versioned`.`/table/dir`
  *   SELECT ... FROM `graft-versioned`.`/table/dir` VERSION AS OF 3
  *   SELECT ... FROM `graft-versioned`.`/table/dir` TIMESTAMP AS OF '...'
  *
  * (Delta's `delta.`/path`` SQL shape, `02_bronze_to_silver.py:394-398`)
  * by substituting [[graft.table.Versioned]]'s snapshot scan — the
  * native parquet plan plus any DV anti-join — directly into the query
  * plan. No relation boundary, no row conversion: the inlined subplan
  * optimizes with the whole query (pushdown, pruning, codegen), which
  * is exactly why this is an analyzer rule and not another DataSource.
  */
final class ResolveGraftVersionedRelation(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftPath(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(fmt, path) if fmt.equalsIgnoreCase("graft-versioned") && !u.isStreaming =>
        Some(path)
      case _ => None
    }

  private def snapshot(path: String, v: Long): LogicalPlan =
    graft.table.Versioned.readAt(spark, path, v).queryExecution.analyzed

  /** A MERGE target keeps its IDENTITY (the statement mutates the
    * table), so it must be claimed at the root BEFORE the bottom-up
    * relation pass below would inline it away as a snapshot scan.
    * Two target spellings resolve to a table dir: the path form
    * `graft-versioned`.`/dir` and a [[GraftCatalog]] name
    * (`cat.ns.t`, explicit catalog prefix).
    */
  private def graftTargetDir(u: UnresolvedRelation): Option[String] =
    if (u.isStreaming) None
    else graftPath(u).orElse(
      Bridge.graftCatalogTableDir(spark, u.multipartIdentifier))

  private def graftMergeTarget(p: LogicalPlan): Option[(String, Option[String])] =
    p match {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(id, u: UnresolvedRelation) =>
        graftTargetDir(u).map(_ -> Some(id.name))
      case u: UnresolvedRelation =>
        // no explicit alias: standard SQL qualifies by the table name —
        // accept the identifier's last part (`MERGE INTO cat.ns.orders
        // ... ON orders.k = s.k`)
        graftTargetDir(u).map(_ -> Some(u.multipartIdentifier.last))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      graftMergeTarget(m.targetTable) match {
        case Some((path, alias)) => graft.plans.SqlMerge.translate(spark, m, path, alias)
        case None => resolveRelations(plan)
      }
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
      graftMergeTarget(d.table) match {
        case Some((path, _)) => graft.plans.SqlDml.translateDelete(spark, d, path)
        case None => resolveRelations(plan)
      }
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
      graftMergeTarget(u.table) match {
        case Some((path, _)) => graft.plans.SqlDml.translateUpdate(spark, u, path)
        case None => resolveRelations(plan)
      }
    case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
      // claim PATH-form INSERT targets: without this the relation pass
      // below would inline the target as a bare file scan and Spark's
      // file-write command would write around the log (an INSERT
      // OVERWRITE would even clobber a live data file). Catalog-named
      // inserts resolve natively onto the DSv2 write bridge — only the
      // `graft-versioned`.`path` spelling needs claiming.
      val pathTarget = i.table match {
        case u: UnresolvedRelation => graftPath(u)
        case _ => None
      }
      pathTarget match {
        case Some(path) =>
          require(i.partitionSpec.isEmpty,
            "graft-versioned tables take no PARTITION spec (clustering + " +
              "zone maps are the layout story)")
          require(i.userSpecifiedCols.isEmpty,
            "INSERT column lists are not supported on the path form — " +
              "project the query to the table's full schema instead")
          require(!i.ifPartitionNotExists,
            "IF NOT EXISTS partitions do not apply to graft-versioned tables")
          graft.plans.GraftInsertCommand(path, i.query, i.overwrite, i.byName)
        case None => resolveRelations(plan)
      }
    case t: org.apache.spark.sql.catalyst.plans.logical.TruncateTable =>
      // TRUNCATE wraps its target in UnresolvedTable (not
      // UnresolvedRelation); only the PATH form needs claiming here —
      // catalog-named tables resolve natively onto the DSv2
      // TruncatableTable the batch table implements
      t.table match {
        case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
          ut.multipartIdentifier match {
            case Seq(fmt, path) if fmt.equalsIgnoreCase("graft-versioned") =>
              graft.plans.GraftTruncateCommand(path)
            case _ => resolveRelations(plan)
          }
        case _ => resolveRelations(plan)
      }
    case _ => resolveRelations(plan)
  }

  private def resolveRelations(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      graftPath(u) match {
        case None => tt
        case Some(path) => (version, ts) match {
          case (Some(v), _) => snapshot(path, v.toLong)
          case (None, Some(e)) =>
            val micros = Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
              .eval(null)
            require(micros != null,
              s"TIMESTAMP AS OF expression does not evaluate to a timestamp: $e")
            graft.table.Versioned
              .readAsOf(spark, path, micros.asInstanceOf[Long] / 1000L)
              .queryExecution.analyzed
          case (None, None) => tt
        }
      }
    case u: UnresolvedRelation =>
      graftPath(u) match {
        case Some(path) =>
          snapshot(path, graft.table.Versioned.currentVersion(spark, path)
            .getOrElse(throw new IllegalArgumentException(
              s"no committed versions at $path")))
        case None => u
      }
  }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    def arity(args: Seq[Expression]): Expression =
      try builder(args) catch {
        case _: MatchError =>
          throw new IllegalArgumentException(s"wrong arguments for $name — usage: $usage")
      }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), arity)
  }

  /** (identifier, info, builder) for every exposed function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_polyhash", "graft_polyhash(str[, base])", {
      case Seq(c) => PolyHash(c)
      case Seq(c, b) => PolyHash(c, litInt(b, "base").toLong)
    }),
    fn("graft_dot", "graft_dot(array<double>, array<double>)", {
      case Seq(a, b) => DotProduct(a, b)
    }),
    fn("graft_word_shingles", "graft_word_shingles(str, k)", {
      case Seq(c, k) => WordShingles(c, litInt(k, "k"))
    }),
    fn("graft_minhash_sig", "graft_minhash_sig(array<bigint>, n)", {
      case Seq(c, n) => MinHashSig(c, litInt(n, "n"))
    }),
    fn("graft_intersect_size", "graft_intersect_size(array<string>, array<string>)", {
      case Seq(a, b) => IntersectSize(a, b)
    }),
    fn("graft_kmin", "graft_kmin(bigint, k) — aggregate: k smallest distinct values", {
      case Seq(c, k) => KMinValues(c, litInt(k, "k")).toAggregateExpression()
    }))

  /** Registers every function on an already-built session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      Bridge.registerFunction(spark, id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      Bridge.registerTableFunction(spark, id, info, builder)
    }
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => s.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  /** `table_changes('cat.ns.t' | '/table/dir', from[, to])` — the
    * statement-level change-feed entry (Delta's `table_changes` TVF),
    * so a pure-SQL client reads CDF without `format("graft-versioned")`
    * options:
    *
    *   SELECT * FROM table_changes('lake.sales.orders', 2)
    *   SELECT * FROM table_changes('lake.sales.orders', 2, 5)
    *   SELECT * FROM table_changes('/tables/orders', '2026-08-01', '2026-08-02')
    *
    * Bounds are version numbers (integer literals, Delta's INCLUSIVE
    * convention: changes committed in versions `from..to`) or commit
    * timestamps (string literals: the first commit at/after `from`, the
    * last at/before `to`); `to` defaults to the head. Resolution and the
    * O(changed files) per-commit plan are the SAME code the DSv2 option
    * path runs ([[org.apache.spark.sql.graft.VersionedBatchTable]]) —
    * the TVF only translates the inclusive `from` to the engine's
    * exclusive `startingVersion` diff base. `from = 1` included: the
    * explicit `startingVersion 0` it maps to serves the REAL per-commit
    * feed from the table's birth (v1's rows as inserts tagged 1, then
    * each commit's changes) — not the head-snapshot initial-snapshot
    * mode, which only an absent start bound selects.
    */
  private def tableChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2 || args.size == 3,
      "usage: table_changes(table, from[, to]) — from/to are version " +
        "numbers (integer literals, inclusive) or commit timestamps " +
        "(string literals)")
    val spark = SparkSession.active
    val ident = litString(args.head, "table_changes: table")
    val dir =
      if (ident.contains("/")) ident
      else Bridge.graftCatalogTableDir(spark, ident.split('.').toSeq).getOrElse(
        throw new IllegalArgumentException(
          s"table_changes: '$ident' does not name a GraftCatalog table — " +
            "register the catalog (spark.sql.catalog.<name>) or pass the " +
            "table directory path"))
    def versionOf(e: Expression, what: String): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Literal(_: org.apache.spark.unsafe.types.UTF8String,
          org.apache.spark.sql.types.StringType) => None
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer version or a timestamp " +
          s"string literal, got $other")
    }
    val reader = spark.read.format("graft-versioned")
      .option("readChangeFeed", "true")
    val withStart = versionOf(args(1), "from") match {
      case Some(v) =>
        require(v >= 1, s"table_changes: from version must be >= 1, got $v")
        reader.option("startingVersion", (v - 1).toString)
      case None =>
        reader.option("startingTimestamp", litString(args(1), "from"))
    }
    val bounded = args.drop(2).headOption match {
      case Some(toE) => versionOf(toE, "to") match {
        case Some(v) => withStart.option("endingVersion", v.toString)
        case None => withStart.option("endingTimestamp", litString(toE, "to"))
      }
      case None => withStart
    }
    bounded.load(dir).queryExecution.analyzed
  }

  /** (identifier, info, builder) for every exposed TABLE function. */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq((FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft", "table_changes"),
      (args: Seq[Expression]) => tableChanges(args)))
}
