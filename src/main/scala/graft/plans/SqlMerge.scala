package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, Row, SparkSession}

import graft.ops.Upsert
import graft.table.Versioned

/** SQL `MERGE INTO` over versioned tables — the statement form of the
  * reference's core mutation (`DeltaTable.merge`,
  * `02_bronze_to_silver.py:67-87`), reachable as pure SQL text:
  *
  *   MERGE INTO `graft-versioned`.`/table/dir` t
  *   USING source_view s
  *   ON t.k = s.k
  *   WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = s.c, ...
  *   WHEN NOT MATCHED THEN INSERT * | (cols...) VALUES (s.cols...)
  *
  * Spark's parser already produces [[MergeIntoTable]] for this text; the
  * engine's analyzer rule ([[graft.ResolveGraftVersionedRelation]])
  * hands graft-targeted statements here BEFORE the built-in resolution
  * path rejects the target for lacking DSv2 row-level-operation support.
  * Translation maps the statement onto [[Versioned.merge]] — the SAME
  * log-committing, matched-file-pruning engine the Scala API runs, so
  * the SQL form inherits its transactional contract (commuting conflict
  * rule, DV awareness, schema enforcement) rather than reimplementing
  * MERGE a second time.
  *
  * Supported shape = exactly what [[Versioned.merge]] expresses:
  * an equi-key ON conjunction, at most one matched UPDATE action whose
  * assignments take the SOURCE row's same-name columns (Delta's
  * `whenMatchedUpdate(set = source refs)`), and an unconditional
  * INSERT-all action. DELETE actions, conditional inserts,
  * NOT MATCHED BY SOURCE, and schema evolution fail loudly with the
  * Scala-API alternative named in the error.
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

  def translate(
      spark: SparkSession, m: MergeIntoTable,
      dir: String, targetAlias: Option[String]): LogicalPlan = {
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported — widen the table first " +
        "with Versioned.append(mergeSchema = true)")
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported by the versioned merge — " +
        "unmatched target rows always carry over; use Versioned.deleteWhere " +
        "for source-absence deletes")

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

    // Rewrites a statement-side predicate into the engine's prefixed
    // joined-frame refs (Upsert.tcol/scol) — how updateWhen conditions
    // address "the target's version of c" vs "the source's".
    def sided(e: Expression): Column = Bridge.column(e.transformUp {
      case ua: UnresolvedAttribute => ua.nameParts match {
        case Seq(q, c) if isT(q) => Bridge.expression(Upsert.tcol(c))
        case Seq(q, c) if isS(q) => Bridge.expression(Upsert.scol(c))
        case parts => err(
          s"condition ref ${parts.mkString(".")} must be qualified by the " +
            "target or source alias (both sides share a schema, so an " +
            "unqualified name cannot pick a side)")
      }
    })

    def requireSourceSameName(c: String, v: Expression): Unit = v match {
      case ua: UnresolvedAttribute if colNameOf(ua).equalsIgnoreCase(c) &&
          (ua.nameParts.size == 1 || isS(ua.nameParts.head)) => ()
      case other => err(
        s"assignment $c = $other is not supported — the versioned merge " +
          "takes the SOURCE row's value per column (SET c = s.c / SET *); " +
          "precompute derived values into the source relation instead")
    }

    val (updateWhen, setCols) = m.matchedActions match {
      case Seq() =>
        // no matched clause: matched rows keep the target version —
        // insert-only merge (the reference's M1, 01:58-68)
        (org.apache.spark.sql.functions.lit(false), Nil)
      case Seq(UpdateStarAction(cond)) =>
        (cond.map(sided).getOrElse(org.apache.spark.sql.functions.lit(true)), Nil)
      case Seq(UpdateAction(cond, assigns, fromStar)) =>
        val cols =
          if (fromStar) Nil
          else assigns.map { case Assignment(k, v) =>
            val c = colNameOf(k)
            requireSourceSameName(c, v)
            c
          }
        (cond.map(sided).getOrElse(org.apache.spark.sql.functions.lit(true)), cols)
      case Seq(DeleteAction(_)) | Seq(_, DeleteAction(_)) | Seq(DeleteAction(_), _) =>
        err("WHEN MATCHED THEN DELETE is not supported by the versioned " +
          "merge — use Versioned.deleteWhere / deleteWhereMoR")
      case many => err(
        s"at most one WHEN MATCHED action is supported, got ${many.size}")
    }

    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertStarAction(Some(_))) =>
        err("conditional INSERT is not supported — the versioned merge " +
          "inserts every unmatched source row; pre-filter the source instead")
      case Seq(InsertAction(None, assigns)) =>
        assigns.foreach { case Assignment(k, v) =>
          requireSourceSameName(colNameOf(k), v)
        }
        // a partial column list would silently widen to the full source
        // row (merge inserts whole rows) — refuse unless it covers the
        // table's schema exactly
        val width = Versioned.currentVersion(spark, dir)
          .flatMap(v => Versioned.schemaAt(spark, dir, v)).map(_.size)
        width.filter(_ != assigns.size).foreach(w => err(
          s"INSERT column list names ${assigns.size} of $w table columns — " +
            "the versioned merge inserts whole source rows; use INSERT * " +
            "(or name every column)"))
      case Seq(InsertAction(Some(_), _)) =>
        err("conditional INSERT is not supported — pre-filter the source")
      case Seq() =>
        err("a WHEN NOT MATCHED THEN INSERT action is required — the " +
          "versioned merge always inserts unmatched source rows (update-only " +
          "merges: pre-join the source to the target's key set)")
      case many => err(
        s"at most one WHEN NOT MATCHED action is supported, got ${many.size}")
    }

    // SET column names must resolve against the TABLE schema, and in
    // the table's own spelling: SQL identifiers are case-insensitive by
    // default while Versioned.merge's setCols matching is exact-case —
    // an unvalidated case-variant (SET Value_C = s.Value_C) would
    // silently update NO columns while still committing a version
    val committedSchema = Versioned.currentVersion(spark, dir)
      .flatMap(v => Versioned.schemaAt(spark, dir, v))
    val canonSetCols = committedSchema match {
      case Some(sch) => setCols.map { c =>
        sch.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(err(
          s"SET column $c is not a table column " +
            s"(${sch.fieldNames.mkString(", ")})"))
      }
      case None => setCols
    }

    // resolve the source NOW (nested analysis, like the snapshot-inline
    // rule does for reads) so a missing view/column surfaces at plan
    // time with Spark's own error, not at execution
    val analyzedSource = Bridge.ofRows(spark, m.sourceTable).queryExecution.analyzed
    GraftMergeCommand(dir, analyzedSource, keys, updateWhen, canonSetCols)
  }
}

/** The executable form: runs [[Versioned.merge]] and returns the
  * committed version as a one-row result (the observable a SQL caller
  * can assert on). A leaf command — the resolved source plan rides as a
  * plain field, not a child, so the analyzer leaves it alone and the
  * merge's own schema enforcement is the contract that checks it.
  */
final case class GraftMergeCommand(
    dir: String,
    source: LogicalPlan,
    keys: Seq[String],
    updateWhen: Column,
    setCols: Seq[String]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = Versioned.merge(
      spark, dir, Bridge.ofRows(spark, source), keys, updateWhen, setCols)
    Seq(Row(v))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $dir keys=[${keys.mkString(", ")}]"
}
