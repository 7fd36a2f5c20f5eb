/** SQL stored procedures for versioned-table maintenance — the
  * `CALL cat.system.<proc>(...)` surface (Spark 4 DSv2 procedures, the
  * Iceberg-procedures shape; Delta spells these OPTIMIZE/VACUUM parser
  * extensions, this engine exposes them through the standard catalog
  * API instead):
  *
  *   CALL lake.system.vacuum(table => 'sales.orders', keep_versions => 5)
  *   CALL lake.system.compact(table => 'sales.orders')
  *   CALL lake.system.optimize(table => 'sales.orders',
  *                             cluster_by => 'o_orderkey')
  *   CALL lake.system.zone(table => 'sales.orders', columns => 'o_custkey')
  *   CALL lake.system.restore(table => 'sales.orders', version => 3)
  *   CALL lake.system.history(table => 'sales.orders')
  *   CALL lake.system.add_constraint(table => 't', name => 'positive',
  *                                   expr => 'amount > 0')
  *   CALL lake.system.drop_constraint(table => 't', name => 'positive')
  *
  * Each procedure is a thin binding onto the engine's Scala op (the
  * SAME committed, OCC-checked code path — procedures add no second
  * implementation), and results come back as rows (committed version,
  * deleted paths, history) so operational SQL can assert on them.
  */
package org.apache.spark.sql.graft

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.table.Versioned

private[graft] object GraftProcedures {

  /** One self-binding procedure: fixed parameter list, fixed output
    * schema, a driver-side body returning result rows. Maintenance ops
    * are driver-coordinated log commits, so a single LocalScan of the
    * outcome is the faithful result shape.
    */
  final case class Proc(
      pname: String,
      desc: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      body: (SparkSession, InternalRow) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): JIterator[Scan] = {
      val resultRows = body(SparkSession.active, input).toArray
      val schema = out
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = schema
      }).iterator()
    }
  }

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(
      name: String, dt: org.apache.spark.sql.types.DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def row(values: Any*): InternalRow =
    new GenericInternalRow(values.toArray)

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private val VersionOut = new StructType().add("version", LongType, nullable = false)

  def all(catalog: GraftCatalog): Seq[Proc] = {

    def dirOf(input: InternalRow, i: Int = 0): String = {
      val table = input.getUTF8String(i).toString
      val parts = table.split('.')
      val ident = Identifier.of(parts.init, parts.last)
      val dir = catalog.tableDir(ident)
      require(catalog.tableExists(ident), s"no versioned table at $dir")
      dir
    }

    def splitCols(input: InternalRow, i: Int): Seq[String] =
      input.getUTF8String(i).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq

    Seq(
      Proc("vacuum",
        "delete data/log artifacts outside the retained version window",
        Seq(in("table", StringType),
          inDefault("keep_versions", IntegerType, "1"),
          inDefault("dry_run", BooleanType, "false")),
        new StructType().add("removed_path", StringType, nullable = false),
        (s, in) => Versioned.vacuum(s, dirOf(in), in.getInt(1), dryRun = in.getBoolean(2))
          .map(p => row(utf8(p)))),

      Proc("vacuum_retain",
        "age-based vacuum: keep every version committed within the window (plus the head)",
        Seq(in("table", StringType),
          in("retain_hours", org.apache.spark.sql.types.DoubleType),
          inDefault("dry_run", BooleanType, "false")),
        new StructType().add("removed_path", StringType, nullable = false),
        (s, in) => Versioned.vacuumRetain(s, dirOf(in),
          (in.getDouble(1) * 3600000L).toLong, dryRun = in.getBoolean(2))
          .map(p => row(utf8(p)))),

      Proc("compact",
        "rewrite the current snapshot as one compacted file set",
        Seq(in("table", StringType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.compact(s, dirOf(in))))),

      Proc("optimize",
        "range-cluster the table on the given columns and republish zone maps",
        Seq(in("table", StringType), in("cluster_by", StringType),
          inDefault("target_files", IntegerType, "0")),
        VersionOut,
        (s, in) => Seq(row(Versioned.optimizeClusterBy(
          s, dirOf(in), splitCols(in, 1), in.getInt(2))))),

      Proc("zorder",
        "rewrite the table clustered on the interleaved bits of the given columns",
        Seq(in("table", StringType), in("zorder_by", StringType),
          inDefault("target_files", IntegerType, "0")),
        VersionOut,
        (s, in) => Seq(row(Versioned.optimizeZOrderBy(
          s, dirOf(in), splitCols(in, 1), in.getInt(2))))),

      Proc("zorder_incremental",
        "z-order only the files no prior optimize produced (O(new data) maintenance)",
        Seq(in("table", StringType), in("zorder_by", StringType),
          inDefault("target_files", IntegerType, "0")),
        new StructType().add("version", LongType, nullable = true),
        (s, in) => Seq(row(Versioned.zorderIncremental(
          s, dirOf(in), splitCols(in, 1), in.getInt(2)).map(Long.box).orNull))),

      Proc("bloom_incremental",
        "extend the bloom index to files appended since its build " +
          "(stats only the uncovered files; O(new data) maintenance)",
        Seq(in("table", StringType)),
        new StructType().add("version", LongType, nullable = false)
          .add("files_statted", LongType, nullable = false),
        (s, in) => {
          val (v, n) = Versioned.buildBloomIncremental(s, dirOf(in))
          Seq(row(v, n))
        }),

      Proc("zone",
        "publish zone-map (data skipping) stats for the head snapshot",
        Seq(in("table", StringType), in("columns", StringType)),
        VersionOut,
        (s, in) => {
          val dir = dirOf(in)
          val head = Versioned.currentVersion(s, dir).getOrElse(
            throw new IllegalArgumentException(s"no committed versions at $dir"))
          Versioned.writeZoneMaps(s, dir, head, splitCols(in, 1))
          Seq(row(head))
        }),

      Proc("analyze",
        "backfill per-file row-count stats for the head snapshot (legacy-table " +
          "adoption of the numRecords discipline; new tables stat at write)",
        Seq(in("table", StringType)),
        new StructType().add("version", LongType, nullable = false)
          .add("files_statted", LongType, nullable = false),
        (s, in) => {
          val (v, n) = Versioned.analyzeTable(s, dirOf(in))
          Seq(row(v, n))
        }),

      Proc("analyze_columns",
        "compute per-column NDV/null/min-max/length statistics (one " +
          "distributed pass) and publish the colstats sidecar DSv2 scans " +
          "report to the CBO; empty cols = all columns",
        Seq(in("table", StringType), inDefault("cols", StringType, "''")),
        new StructType().add("version", LongType, nullable = false)
          .add("columns_analyzed", LongType, nullable = false),
        (s, in) => {
          val (v, n) = Versioned.analyzeColumns(s, dirOf(in), splitCols(in, 1))
          Seq(row(v, n))
        }),

      Proc("clone",
        "shallow-clone the source snapshot into a new table (zero data copy); " +
          "version => n forks that retained snapshot instead of the head; " +
          "deep => true copies the bytes (the clone owns its files, no source pin)",
        Seq(in("source", StringType), in("target", StringType),
          inDefault("version", LongType, "0"),
          inDefault("deep", BooleanType, "false")),
        VersionOut,
        (s, in) => {
          // target is a catalog identifier that must NOT exist yet —
          // cloneTable itself refuses an existing destination
          val parts = in.getUTF8String(1).toString.split('.')
          val dstDir = catalog.tableDir(Identifier.of(parts.init, parts.last))
          // version 0 (the default) = head; versions are 1-based
          val asOf = Some(in.getLong(2)).filter(_ > 0L)
          Seq(row(Versioned.cloneTable(s, dirOf(in), dstDir, asOf,
            deep = in.getBoolean(3))))
        }),

      Proc("convert",
        "register an existing plain-parquet directory as a versioned table in place",
        Seq(in("table", StringType)),
        VersionOut,
        (s, in) => {
          // the name must resolve through the catalog but NOT be a
          // table yet — convert publishes its v1
          val parts = in.getUTF8String(0).toString.split('.')
          val dir = catalog.tableDir(Identifier.of(parts.init, parts.last))
          Seq(row(Versioned.convert(s, dir)))
        }),

      Proc("reorg",
        "physically purge drifted files: DV carriers rewritten with DVs " +
          "materialized, pre-DROP-COLUMN files re-stored under the current " +
          "physical schema; clean files untouched",
        Seq(in("table", StringType)),
        VersionOut,
        (s, in) => {
          val dir = dirOf(in)
          Seq(row(Versioned.reorgPurge(s, dir).getOrElse(
            Versioned.currentVersion(s, dir).getOrElse(
              throw new IllegalArgumentException(
                s"no committed versions at $dir")))))
        }),

      Proc("rebucket",
        "restore the declared bucket layout: rewrite exactly the untagged " +
          "files (row-rewriting maintenance outputs) through the bucketed " +
          "writer so the scan's co-partitioning report returns; tagged " +
          "files carry untouched",
        Seq(in("table", StringType)),
        VersionOut,
        (s, in) => {
          val dir = dirOf(in)
          Seq(row(Versioned.rebucket(s, dir).getOrElse(
            Versioned.currentVersion(s, dir).getOrElse(
              throw new IllegalArgumentException(
                s"no committed versions at $dir")))))
        }),

      Proc("set_property",
        "set one table property (the SET TBLPROPERTIES commit)",
        Seq(in("table", StringType), in("key", StringType),
          in("value", StringType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.setProperties(s, dirOf(in),
          Map(in.getUTF8String(1).toString -> in.getUTF8String(2).toString))))),

      Proc("unset_property",
        "remove one table property (UNSET TBLPROPERTIES; if_exists tolerates " +
          "unknown keys)",
        Seq(in("table", StringType), in("key", StringType),
          inDefault("if_exists", BooleanType, "false")),
        VersionOut,
        (s, in) => Seq(row(Versioned.unsetProperties(s, dirOf(in),
          Seq(in.getUTF8String(1).toString), in.getBoolean(2))))),

      Proc("properties",
        "list the head snapshot's table properties",
        Seq(in("table", StringType)),
        new StructType().add("key", StringType, nullable = false)
          .add("value", StringType, nullable = false),
        (s, in) => {
          val dir = dirOf(in)
          val head = Versioned.currentVersion(s, dir).getOrElse(
            throw new IllegalArgumentException(s"no committed versions at $dir"))
          Versioned.propertiesAt(s, dir, head).toSeq.sorted
            .map { case (k, v) => row(utf8(k), utf8(v)) }
        }),

      Proc("set_identity",
        "declare an IDENTITY column (start/step; allow_explicit keeps " +
          "caller-supplied values instead of refusing them)",
        Seq(in("table", StringType), in("column", StringType),
          inDefault("start", LongType, "1"), inDefault("step", LongType, "1"),
          inDefault("allow_explicit", BooleanType, "false")),
        VersionOut,
        (s, in) => Seq(row(Versioned.setIdentityColumn(s, dirOf(in),
          in.getUTF8String(1).toString, in.getLong(2), in.getLong(3),
          in.getBoolean(4))))),

      Proc("pins",
        "list clone pins protecting this table's files from vacuum",
        Seq(in("table", StringType)),
        new StructType().add("pin", StringType, nullable = false)
          .add("pinned_version", LongType, nullable = false)
          .add("n_files", IntegerType, nullable = false),
        (s, in) => Versioned.listPins(s, dirOf(in)).map { case (n, v, c) =>
          row(utf8(n), v, c) }),

      Proc("remove_pin",
        "release a clone pin (its files become vacuum candidates again)",
        Seq(in("table", StringType), in("pin", StringType)),
        new StructType().add("removed", StringType, nullable = false),
        (s, in) => {
          val name = in.getUTF8String(1).toString
          Versioned.removePin(s, dirOf(in), name)
          Seq(row(utf8(name)))
        }),

      Proc("restore",
        "commit a snapshot restoring the table to an earlier version",
        Seq(in("table", StringType), in("version", LongType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.restore(s, dirOf(in), in.getLong(1))))),

      Proc("restore_asof",
        "restore the table to the newest version committed at or before the instant",
        Seq(in("table", StringType), in("timestamp", StringType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.restoreAsOf(s, dirOf(in),
          Versioned.parseTimestampMillis(in.getUTF8String(1).toString))))),

      Proc("history",
        "commit history: version, operation, commit timestamp, live file " +
          "count (limit > 0 reads only the NEWEST `limit` commits — " +
          "O(limit) log entries, never the whole chain)",
        Seq(in("table", StringType), inDefault("limit", IntegerType, "0")),
        new StructType().add("version", LongType, nullable = false)
          .add("op", StringType, nullable = false)
          .add("commit_ts", LongType, nullable = false)
          .add("n_files", LongType, nullable = false),
        (s, in) => {
          val lim = in.getInt(1)
          val df = if (lim > 0) Versioned.history(s, dirOf(in), lim)
            else Versioned.history(s, dirOf(in))
          df.collect().toSeq.map(r =>
            row(r.getLong(0), utf8(r.getString(1)), r.getLong(2), r.getLong(3)))
        }),

      Proc("detail",
        "current-snapshot summary: version, commit time, files, bytes, " +
          "soft-deleted positions, metadata row count, constraints, layouts",
        Seq(in("table", StringType)),
        new StructType().add("version", LongType, nullable = false)
          .add("commit_ts", LongType, nullable = false)
          .add("n_files", LongType, nullable = false)
          .add("size_bytes", LongType, nullable = false)
          .add("n_soft_deleted", LongType, nullable = false)
          .add("num_rows", LongType, nullable = true)
          .add("constraints", StringType, nullable = false)
          .add("clustering", StringType, nullable = false)
          .add("bucket_spec", StringType, nullable = false),
        (s, in) => Versioned.detail(s, dirOf(in)).collect().toSeq.map(r =>
          row(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), if (r.isNullAt(5)) null else r.getLong(5),
            utf8(r.getSeq[String](6).mkString(",")),
            utf8(r.getString(7)), utf8(r.getString(8))))),

      Proc("add_constraint",
        "register a CHECK constraint enforced by every subsequent write",
        Seq(in("table", StringType), in("name", StringType), in("expr", StringType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.addConstraint(
          s, dirOf(in), in.getUTF8String(1).toString, in.getUTF8String(2).toString)))),

      Proc("drop_constraint",
        "drop a registered CHECK constraint",
        Seq(in("table", StringType), in("name", StringType)),
        VersionOut,
        (s, in) => Seq(row(Versioned.dropConstraint(
          s, dirOf(in), in.getUTF8String(1).toString)))))
  }
}
