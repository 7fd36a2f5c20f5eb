package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, Row, SparkSession}

import graft.ops.Upsert
import graft.ops.Upsert.MergeClause
import graft.table.Versioned

/** SQL `MERGE INTO` over versioned tables — the statement form of the
  * reference's core mutation (`DeltaTable.merge`,
  * `02_bronze_to_silver.py:67-87`), reachable as pure SQL text with the
  * FULL Delta action grammar:
  *
  *   MERGE INTO `graft-versioned`.`/table/dir` t
  *   USING source_view s
  *   ON t.k = s.k
  *   WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = <expr>, ...
  *   WHEN MATCHED [AND <cond>] THEN DELETE
  *   WHEN NOT MATCHED [AND <cond>] THEN INSERT * | (cols...) VALUES (s.cols...)
  *   WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE | UPDATE SET ...
  *
  * Clauses within a slot are first-match-wins in statement order
  * (Delta/SQL:2003 semantics); all but the last clause of a slot must
  * carry a condition ([[Upsert.mergeFull]] enforces this).
  *
  * Spark's parser already produces [[MergeIntoTable]] for this text; the
  * engine's analyzer rule ([[graft.ResolveGraftVersionedRelation]])
  * hands graft-targeted statements here BEFORE the built-in resolution
  * path rejects the target for lacking DSv2 row-level-operation support.
  * Translation maps the statement onto [[Versioned.mergeFull]] — the
  * SAME log-committing, matched-file-pruning engine the Scala API runs,
  * so the SQL form inherits its transactional contract (commuting
  * conflict rule incl. the by-source extension, DV awareness, schema
  * enforcement) rather than reimplementing MERGE a second time.
  * `MERGE WITH SCHEMA EVOLUTION` maps onto the engine's evolveSchema
  * flag: source-only columns append to the committed schema (nullable;
  * kept files surface NULL there), target-only columns pad the source
  * with NULLs — Delta's withSchemaEvolution contract.
  *
  * Remaining limits, each failing loudly with the alternative named:
  * the ON clause must be an equi-key conjunction (the key set the merge
  * shuffles/broadcasts on); INSERT takes whole source rows (a column
  * list must cover the schema with same-name source refs — precompute
  * derived values into the source).
  */
object SqlMerge {

  private def err(msg: String): Nothing = throw new IllegalArgumentException(
    s"MERGE INTO graft-versioned: $msg")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Last name part of a (possibly alias-qualified) column ref. */
  private def colNameOf(e: Expression): String = e match {
    case ua: UnresolvedAttribute if ua.nameParts.size <= 2 => ua.nameParts.last
    case other => err(s"expected a column reference, got $other")
  }

  /** Which side an unqualified ref may bind to inside a clause. */
  private sealed trait Scope
  private case object BothSides extends Scope
  private case object TargetOnly extends Scope
  private case object SourceOnly extends Scope

  def translate(
      spark: SparkSession, m: MergeIntoTable,
      dir: String, targetAlias: Option[String]): LogicalPlan = {
    val (sourceAlias, _) = m.sourceTable match {
      case SubqueryAlias(id, _) => (Some(id.name), ())
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        (Some(u.multipartIdentifier.last), ())
      case _ => (None, ())
    }
    def isT(q: String) = targetAlias.exists(_.equalsIgnoreCase(q))
    def isS(q: String) = sourceAlias.exists(_.equalsIgnoreCase(q))

    // ON: a conjunction of target.k = source.k equi-predicates — the key
    // set Versioned.merge shuffles/broadcasts on. Side identity comes
    // from the statement's aliases; an unqualified ref is ambiguous by
    // construction (merge requires identical schemas on both sides).
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        (a.nameParts, b.nameParts) match {
          case (Seq(qa, ca), Seq(qb, cb)) if ca.equalsIgnoreCase(cb) &&
              ((isT(qa) && isS(qb)) || (isS(qa) && isT(qb))) => ca
          case (pa, pb) => err(
            s"ON predicate ${pa.mkString(".")} = ${pb.mkString(".")} must " +
              "equate the SAME column across the two sides, qualified by the " +
              "target and source aliases (e.g. t.k = s.k)")
        }
      case other => err(
        s"ON supports only equi-key conjunctions (t.k = s.k AND ...), got $other")
    }

    // Rewrites a statement-side expression into the engine's prefixed
    // joined-frame refs (Upsert.tcol/scol) — how clause conditions and
    // SET values address "the target's version of c" vs "the source's".
    // `scope` governs unqualified refs: in single-side clauses (NOT
    // MATCHED / NOT MATCHED BY SOURCE) only one side is in scope, so a
    // bare name binds to it; in matched clauses both sides carry every
    // column and a bare name is ambiguous.
    def sided(e: Expression, scope: Scope): Column = Bridge.column(e.transformUp {
      case ua: UnresolvedAttribute => ua.nameParts match {
        case Seq(q, c) if isT(q) =>
          if (scope == SourceOnly) err(
            s"NOT MATCHED clause cannot reference target column $q.$c — " +
              "the row has no target match")
          Bridge.expression(Upsert.tcol(c))
        case Seq(q, c) if isS(q) =>
          if (scope == TargetOnly) err(
            s"NOT MATCHED BY SOURCE clause cannot reference source column " +
              s"$q.$c — the row has no source match")
          Bridge.expression(Upsert.scol(c))
        case Seq(c) => scope match {
          case TargetOnly => Bridge.expression(Upsert.tcol(c))
          case SourceOnly => Bridge.expression(Upsert.scol(c))
          case BothSides => err(
            s"condition ref $c must be qualified by the target or source " +
              "alias (both sides share a schema, so an unqualified name " +
              "cannot pick a side)")
        }
        case parts => err(
          s"ref ${parts.mkString(".")} is over-qualified or names an " +
            "unknown alias")
      }
    })

    // SET column names resolve against the TABLE schema, in the table's
    // own spelling: SQL identifiers are case-insensitive by default
    // while the engine's set-map matching is exact-case — an unvalidated
    // case-variant (SET Value_C = ...) would silently update NO columns
    // while still committing a version
    val committedSchema = Versioned.currentVersion(spark, dir)
      .flatMap(v => Versioned.schemaAt(spark, dir, v))
    def canon(c: String): String = committedSchema match {
      case Some(sch) => sch.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(err(
        s"SET column $c is not a table column (${sch.fieldNames.mkString(", ")})"))
      case None => c
    }
    def setMap(assigns: Seq[Assignment], scope: Scope): Map[String, Column] = {
      val pairs = assigns.map { case Assignment(k, v) =>
        canon(colNameOf(k)) -> sided(v, scope)
      }
      val dup = pairs.groupBy(_._1).collect { case (c, vs) if vs.size > 1 => c }
      if (dup.nonEmpty) err(s"duplicate SET columns: ${dup.mkString(", ")}")
      pairs.toMap
    }

    val matchedClauses = m.matchedActions.map {
      case UpdateStarAction(cond) =>
        MergeClause.Update(cond.map(sided(_, BothSides)), Map.empty)
      case UpdateAction(cond, assigns, fromStar) =>
        MergeClause.Update(cond.map(sided(_, BothSides)),
          if (fromStar) Map.empty else setMap(assigns, BothSides))
      case DeleteAction(cond) =>
        MergeClause.Delete(cond.map(sided(_, BothSides)))
      case other => err(s"unsupported WHEN MATCHED action $other")
    }

    val insertClauses = m.notMatchedActions.map {
      case InsertStarAction(cond) =>
        MergeClause.Insert(cond.map(sided(_, SourceOnly)))
      case InsertAction(cond, assigns) =>
        assigns.foreach { case Assignment(k, v) =>
          val c = colNameOf(k)
          v match {
            case ua: UnresolvedAttribute if colNameOf(ua).equalsIgnoreCase(c) &&
                (ua.nameParts.size == 1 || isS(ua.nameParts.head)) => ()
            case other => err(
              s"INSERT assignment $c = $other is not supported — the " +
                "versioned merge inserts whole SOURCE rows (INSERT * / " +
                "same-name column lists); precompute derived values into " +
                "the source relation instead")
          }
        }
        // a partial column list would silently widen to the full source
        // row (merge inserts whole rows) — refuse unless it covers the
        // table's schema exactly
        committedSchema.map(_.size).filter(_ != assigns.size).foreach(w => err(
          s"INSERT column list names ${assigns.size} of $w table columns — " +
            "the versioned merge inserts whole source rows; use INSERT * " +
            "(or name every column)"))
        MergeClause.Insert(cond.map(sided(_, SourceOnly)))
      case other => err(s"unsupported WHEN NOT MATCHED action $other")
    }

    val bySourceClauses = m.notMatchedBySourceActions.map {
      case DeleteAction(cond) =>
        MergeClause.Delete(cond.map(sided(_, TargetOnly)))
      case UpdateAction(cond, assigns, false) =>
        MergeClause.Update(cond.map(sided(_, TargetOnly)),
          setMap(assigns, TargetOnly))
      case other => err(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }

    // resolve the source NOW (nested analysis, like the snapshot-inline
    // rule does for reads) so a missing view/column surfaces at plan
    // time with Spark's own error, not at execution
    val analyzedSource = Bridge.ofRows(spark, m.sourceTable).queryExecution.analyzed
    GraftMergeCommand(
      dir, analyzedSource, keys, matchedClauses, insertClauses, bySourceClauses,
      evolveSchema = m.withSchemaEvolution)
  }
}

/** The executable form: runs [[Versioned.mergeFull]] and returns the
  * committed version as a one-row result (the observable a SQL caller
  * can assert on). A leaf command — the resolved source plan rides as a
  * plain field, not a child, so the analyzer leaves it alone and the
  * merge's own schema enforcement is the contract that checks it.
  */
final case class GraftMergeCommand(
    dir: String,
    source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[MergeClause],
    notMatched: Seq[MergeClause],
    notMatchedBySource: Seq[MergeClause],
    evolveSchema: Boolean = false) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = Versioned.mergeFull(
      spark, dir, Bridge.ofRows(spark, source), keys,
      matched, notMatched, notMatchedBySource, evolveSchema)
    Seq(Row(v))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $dir keys=[${keys.mkString(", ")}]"
}
