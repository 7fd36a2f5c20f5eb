/** Batch DSv2 surface of graft versioned tables — the
  * `spark.read.format("graft-versioned")` analog of Delta's batch read
  * (reference reads `spark.read.format("delta").load(path)` at
  * `02_bronze_to_silver.py:394-398` and every gold notebook), so any
  * Spark client reads a versioned table — current snapshot or time
  * travel — with zero graft imports:
  *
  *   spark.read.format("graft-versioned").load(dir)                  // head
  *   spark.read.format("graft-versioned")
  *     .option("versionAsOf", 3).load(dir)                           // Delta option
  *   spark.read.format("graft-versioned")
  *     .option("timestampAsOf", "2026-01-01 00:00:00").load(dir)
  *
  * SCAN ARCHITECTURE (the 100 TB story): a snapshot with no live
  * deletion vectors is EXACTLY a set of immutable parquet files, so the
  * table delegates its scan to Spark's own [[ParquetScanBuilder]] over
  * an exact-file [[InMemoryFileIndex]] — the scan that plans is the
  * native vectorized parquet batch scan with filter pushdown, column
  * pruning, and aggregate pushdown, byte-identical in cost to reading
  * the files directly; this connector adds only the log-resolved file
  * list (driver-side, metadata-scale, same as Delta). Snapshots that DO
  * carry deletion vectors need the DV anti-join, which no file scan can
  * express — those route through a [[V1Scan]] bridge over
  * [[Versioned.readAt]] (column-pruned; the row-conversion boundary is
  * paid only on MoR-mutated snapshots, whose reads pay the DV subtract
  * anyway, and OPTIMIZE/copy-on-write restores the fast path).
  *
  * WHY THIS PACKAGE: same reason as [[VersionedTableSource]] — the
  * exact-file index and parquet scan builder are `org.apache.spark.sql`
  * internals, and Spark's own connectors access them from subpackages.
  * All table/log semantics stay in [[graft.table.Versioned]].
  */
package org.apache.spark.sql.graft

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.Versioned

private[graft] object VersionedBatchTable {

  /** Session opt-in for the storage-partitioned-join report (Iceberg's
    * `preserveDataGrouping` analog, same default): `false` keeps plain
    * scans of bucketed tables at full split parallelism; `true` makes
    * the scan report `KeyGroupedPartitioning` so co-bucketed joins plan
    * shuffle-free (Spark then groups tasks at the bucket count).
    */
  val PreserveGroupingKey = "spark.sql.graft.preserveDataGrouping"

  def pathOf(options: JMap[String, String]): String = {
    val ci = new CaseInsensitiveStringMap(options)
    Option(ci.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-versioned requires a path: .load(<versioned table dir>) or " +
        "option(\"path\", ...)"))
  }

  /** Resolves the snapshot the options name: `versionAsOf` wins, then
    * `timestampAsOf` (any string `to_timestamp` accepts, or epoch
    * millis), else the current head. None = table has no commits yet.
    */
  def resolveVersion(
      spark: SparkSession, dir: String, options: JMap[String, String]): Option[Long] = {
    val ci = new CaseInsensitiveStringMap(options)
    (Option(ci.get("versionAsOf")), Option(ci.get("timestampAsOf"))) match {
      case (Some(v), _) =>
        val ver = v.toLong
        require(Versioned.versions(spark, dir).contains(ver),
          s"versionAsOf $ver does not exist (vacuumed or never committed) at $dir")
        Some(ver)
      case (None, Some(ts)) =>
        // parse in the SESSION timezone (a Catalyst cast), exactly like
        // SQL `TIMESTAMP AS OF` and the catalog path — java.sql
        // .Timestamp.valueOf would bind the JVM-default zone and make
        // two surfaces of the same engine read different snapshots for
        // the same string
        val millis = ts.toLongOption.getOrElse {
          val micros = org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(ts),
            org.apache.spark.sql.types.TimestampType,
            Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
          require(micros != null,
            s"cannot parse timestampAsOf '$ts' as a timestamp")
          Math.floorDiv(micros.asInstanceOf[Long], 1000L)
        }
        val vs = Versioned.versions(spark, dir)
        require(vs.nonEmpty, s"no committed versions at $dir")
        Some(vs.filter(Versioned.commitTimestampAt(spark, dir, _) <= millis).lastOption
          .getOrElse(throw new IllegalArgumentException(
            s"no version committed at or before $ts at $dir")))
      case (None, None) => Versioned.currentVersion(spark, dir)
    }
  }

  def schemaFor(spark: SparkSession, dir: String, v: Long): StructType =
    Versioned.schemaAt(spark, dir, v)
      .getOrElse(Versioned.readAt(spark, dir, v).schema)

  /** Translates a pushed overwrite filter back to a Column for
    * [[Versioned.replaceWhere]]. Every shape Spark's own
    * filter-translation emits is covered; anything else refuses loudly
    * — an overwrite predicate the engine cannot honor must never
    * degrade into a silent full overwrite.
    */
  def filterColumn(f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case StringStartsWith(a, v) => col(a).startsWith(v)
      case StringEndsWith(a, v) => col(a).endsWith(v)
      case StringContains(a, v) => col(a).contains(v)
      case And(l, r) => filterColumn(l) && filterColumn(r)
      case Or(l, r) => filterColumn(l) || filterColumn(r)
      case Not(c) => !filterColumn(c)
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case other => throw new IllegalArgumentException(
        s"overwrite-by-filter predicate not supported by graft-versioned: " +
          s"$other — express the slice with comparisons/IN/null-tests over " +
          "table columns")
    }
  }
}

/** One resolved (dir, version) snapshot as a DSv2 batch table. A table
  * with NO commits yet surfaces an empty schema and no capabilities —
  * that keeps `writeStream.format("graft-versioned")` on its V1 sink
  * (the engine checks capabilities before falling back) instead of
  * failing at metadata inference on a first-ever write.
  */
final class VersionedBatchTable(
    spark: SparkSession, dir: String, version: Option[Long],
    declared: Option[StructType]) extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  /** SQL `TRUNCATE TABLE` on catalog-named tables: one overwrite
    * commit of an empty frame under the head schema — rows vanish from
    * the new snapshot, every prior version stays time-travel-readable
    * until vacuum (same contract as the path-form GraftTruncateCommand).
    */
  override def truncateTable(): Boolean = {
    val head = Versioned.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $dir"))
    val s = Versioned.schemaAt(spark, dir, head)
      .getOrElse(Versioned.readAt(spark, dir, head).schema)
    Versioned.overwrite(
      spark.createDataFrame(java.util.Collections.emptyList[Row](), s), dir)
    true
  }

  override def name(): String =
    s"graft-versioned $dir" + version.map(v => s"@v$v").getOrElse("")

  /** The snapshot's log-carried TBLPROPERTIES — what `SHOW
    * TBLPROPERTIES` and `DESCRIBE EXTENDED` render for catalog-named
    * tables.
    */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    version.foreach(v =>
      Versioned.propertiesAt(spark, dir, v).foreach { case (k, p) => m.put(k, p) })
    m
  }

  override def schema(): StructType =
    declared.orElse(version.map(VersionedBatchTable.schemaFor(spark, dir, _)))
      .getOrElse(new StructType())

  /** Declared clustering keys surface as Spark's own ClusterByTransform
    * so `DESCRIBE` renders the layout contract; graft tables have no
    * partition transforms by design (see Versioned.ClusterByKey).
    */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val cluster = version.map(v => Versioned.clusterByAt(spark, dir, v)) match {
      case Some(cols) if cols.nonEmpty =>
        Array[org.apache.spark.sql.connector.expressions.Transform](
          org.apache.spark.sql.connector.expressions.ClusterByTransform(
            cols.map(c =>
              org.apache.spark.sql.connector.expressions.FieldReference
                .column(c)).toSeq))
      case _ =>
        Array.empty[org.apache.spark.sql.connector.expressions.Transform]
    }
    val bucket = version.flatMap(v => Versioned.bucketSpecAt(spark, dir, v))
      .map { case (cols, n) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(
          n, cols: _*)
      }.toArray[org.apache.spark.sql.connector.expressions.Transform]
    cluster ++ bucket
  }

  override def capabilities(): java.util.Set[TableCapability] =
    if (version.isEmpty) java.util.Collections.emptySet()
    else java.util.Set.of(
      TableCapability.BATCH_READ,
      // INSERT INTO / INSERT OVERWRITE / saveAsTable land on the V1
      // write bridge below (one log commit per statement); TRUNCATE is
      // what routes INSERT OVERWRITE's static overwrite here. No
      // STREAMING_WRITE on purpose — stream writes must keep falling
      // back to the exactly-once V1 sink (VersionedTableSink).
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      // overwrite-by-filter routes `df.writeTo(t).overwrite(cond)` to
      // the atomic selective overwrite (Delta's replaceWhere): one
      // commit, matched-file footprint — see Versioned.replaceWhere
      TableCapability.OVERWRITE_BY_FILTER)

  /** SQL/df writes onto the SAME commit paths the Scala API uses:
    * append → [[Versioned.append]], truncate-overwrite →
    * [[Versioned.overwrite]] — full OCC retry, constraint validation,
    * schema binding and zone-map carry, because the bridge IS those
    * functions, not a reimplementation. V1Write hands us a classic
    * DataFrame at execution; the row-conversion boundary is the
    * insert's input, already materialized by the writing query.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var replace = false
      private var replaceCond: Option[org.apache.spark.sql.Column] = None
      override def truncate(): WriteBuilder = { replace = true; this }
      // overwrite-by-filter (Delta's replaceWhere): AlwaysTrue is the
      // full overwrite (same path as TRUNCATE); anything else becomes
      // the atomic selective overwrite. Untranslatable predicates
      // refuse loudly in filterColumn — never a silent full overwrite.
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
        if (filters.isEmpty ||
            filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
          truncate()
        else {
          replaceCond = Some(filters.map(VersionedBatchTable.filterColumn)
            .reduce(_ && _))
          this
        }
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              replaceCond match {
                case Some(c) => Versioned.replaceWhere(spark, dir, data, c)
                case None =>
                  if (replace || overwrite) Versioned.overwrite(data, dir)
                  else Versioned.append(data, dir)
              }
              ()
            }
          }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = version.getOrElse(throw new IllegalArgumentException(
      s"no committed versions at $dir — nothing to read"))
    val dvs = Versioned.dvsAt(spark, dir, v)
    if (dvs.isEmpty && !Versioned.hasColumnMapping(schema()) &&
        !Versioned.hasHivePartition(schema()))
      // fast path: the snapshot IS its parquet files — hand Spark's own
      // parquet scan builder the exact live-file index and get the
      // native vectorized scan + pushdown machinery unchanged; the
      // wrapper adds LOG-SIDE data skipping (zone-map file pruning from
      // the pushed predicates) before the index is built
      new ZonePrunedParquetScanBuilder(spark, dir, v, schema(), options)
    else
      // DV'd or column-mapped snapshots need the logical-name /
      // DV-subtract projection no bare file scan can express: the
      // V1Scan bridge over readAt (column-pruned; OPTIMIZE materializes
      // renames and restores the fast path)
      new V1FrameScanBuilder(schema(), () => Versioned.readAt(spark, dir, v))
  }
}

/** DV-free snapshots: Spark's own [[ParquetScanBuilder]] (native
  * vectorized scan, filter/column/aggregate pushdown) over an exact
  * file index that is ZONE-PRUNED from the pushed predicates — the
  * data-skipping story SQL/DSv2 clients would otherwise lose (the
  * Scala path has `Versioned.readWhere`; this makes
  * `SELECT ... FROM cat.t WHERE k BETWEEN a AND b` skip the same
  * files). At 100 TB this is the difference between planning over a
  * million files and opening the handful whose [lo, hi] ranges
  * intersect the predicate.
  *
  * Mechanics: the builder records what Spark pushes (catalyst filters,
  * aggregation, required columns) against a full-index inner builder —
  * which also answers the pushdown protocol, so parquet-level pushdown
  * is exactly Spark's own. At `build()` the top-level conjuncts are
  * mined for per-column [lo, hi] bounds (eq/gt/ge/lt/le against
  * integral literals, both orientations); each bound consults the
  * snapshot's zone sidecar ([[Versioned.prunedFiles]] — returns the
  * full list when the sidecar or column block is absent) and the
  * surviving intersection becomes a REBUILT inner with the same
  * pushdown replayed. Pruning is sound by the zone-map contract: a
  * file whose range cannot intersect a must-hold conjunct holds no
  * matching row; NULL semantics are safe because zone ranges only
  * drop files where the predicate can never be TRUE (a NULL-valued
  * row makes the comparison NULL → filtered anyway).
  */
private final class ZonePrunedParquetScanBuilder(
    spark: SparkSession, dir: String, v: Long, full: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Attribute => CAttr, EqualTo => CEq, Expression => CExpr, GreaterThan => CGt, GreaterThanOrEqual => CGe, LessThan => CLt, LessThanOrEqual => CLe, Literal => CLit}

  private def mkInner(files: Seq[String]): ParquetScanBuilder = {
    val index = new InMemoryFileIndex(
      spark, files.map(f => new Path(Versioned.dataPathStr(dir, f))),
      Map.empty[String, String],
      Some(full), userSpecifiedPartitionSpec = Some(PartitionSpec.emptySpec))
    ParquetScanBuilder(spark, index, full, full, options)
  }

  private val allFiles = Versioned.filesAt(spark, dir, v)
  // protocol-only inner over an EMPTY index: the pushdown answers
  // (which filters/aggregates parquet accepts) depend on schema and
  // options, not on the file list — so the expensive per-file status
  // listing is paid exactly once, at build(), for the final (possibly
  // zone-pruned) set instead of twice
  private val protoInner = mkInner(Nil)
  // recorded pushdown state, replayed onto the real build
  private var filters: Seq[CExpr] = Nil
  private var aggregation: Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None
  private var required: Option[StructType] = None
  // metadata-answered aggregation (Delta's OptimizeMetadataOnlyQuery
  // analog): see metaAnswer below — when set, build() returns a
  // LocalScan of the one answer row and NO data file is opened
  private var metaAgg: Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = None
  private var metaMemo: Option[(org.apache.spark.sql.connector.expressions.aggregate.Aggregation, Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)])] = None

  override def pushFilters(f: Seq[CExpr]): Seq[CExpr] = {
    filters = f
    protoInner.pushFilters(f)
  }

  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    protoInner.pushedFilters

  /** The one-row metadata answer to a pushed aggregation, when the LOG
    * alone can serve it: an UNFILTERED, UNGROUPED aggregate whose every
    * function is `COUNT(*)` (or `COUNT(col)` on a non-nullable column)
    * over full row-stats coverage ([[Versioned.metaRowCountAt]] — the
    * per-file `numRecords` sidecar), or `MIN`/`MAX` over a column whose
    * zone sidecar covers every live file and whose type round-trips the
    * long stat domain exactly (integral, date, decimal ≤ 18 — NOT
    * timestamps: zone stats truncate them to seconds). Any
    * non-answerable function falls the whole aggregation back to
    * parquet-level pushdown, so results never mix sources.
    *
    * At 100 TB this is the difference between a `COUNT(*)` that opens
    * 10⁶ footers (one GET each, even with parquet aggregate pushdown)
    * and one that reads a handful of log sidecars. Sound because the
    * fast-path precondition excludes deletion vectors, the stats
    * machinery excludes uncovered files (None, never a guess), and the
    * empty-range sentinel makes all-NULL files min/max-neutral.
    */
  private def metaAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = {
    metaMemo match {
      case Some((a, r)) if a eq agg => return r
      case _ =>
    }
    val r = computeMetaAnswer(agg)
    metaMemo = Some((agg, r))
    r
  }

  private def computeMetaAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, org.apache.spark.sql.catalyst.InternalRow)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types.{ByteType, DataType, DateType, DecimalType, IntegerType, LongType, ShortType, StructField}
    if (filters.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    lazy val count: Option[Long] = Versioned.metaRowCountAt(spark, dir, v)
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        full.fields.find(_.name == nr.fieldNames()(0))
      case _ => None
    }
    def statDomainOk(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType => true
      case d: DecimalType if d.precision <= 18 => true
      case _ => false
    }
    def internalOf(x: Long, dt: DataType): Any = dt match {
      case ByteType => x.toByte
      case ShortType => x.toShort
      case IntegerType | DateType => x.toInt
      case LongType => x
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          BigDecimal(BigInt(x), d.scale), d.precision, d.scale)
      case other => throw new IllegalStateException(
        s"unreachable: $other passed statDomainOk")
    }
    def extreme(e: org.apache.spark.sql.connector.expressions.Expression,
        isMin: Boolean): Option[(StructField, Any)] =
      fieldOf(e).filter(f => statDomainOk(f.dataType)).flatMap { f =>
        Versioned.metaMinMaxLongAt(spark, dir, v, f.name).map { case (mn, mx) =>
          val pick = if (isMin) mn else mx
          (StructField(s"${if (isMin) "min" else "max"}(${f.name})",
            f.dataType, nullable = true),
            pick.map(internalOf(_, f.dataType)).orNull)
        }
      }
    val answered: Seq[Option[(StructField, Any)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          count.map(n =>
            (StructField("count(*)", LongType, nullable = false), n))
        case c: Count if !c.isDistinct =>
          // COUNT(col) == COUNT(*) exactly when the committed schema
          // says the column holds no NULLs
          fieldOf(c.column).filter(!_.nullable).flatMap(f =>
            count.map(n =>
              (StructField(s"count(${f.name})", LongType, nullable = false), n)))
        case m: Min => extreme(m.column, isMin = true)
        case m: Max => extreme(m.column, isMin = false)
        case _ => None
      }
    if (answered.isEmpty || answered.exists(_.isEmpty)) None
    else Some((
      StructType(answered.map(_.get._1)),
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        answered.map(_.get._2).toArray)))
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    metaAnswer(agg) match {
      case Some(sr) =>
        metaAgg = Some(sr)
        true
      case None =>
        val ok = protoInner.pushAggregation(agg)
        if (ok) aggregation = Some(agg)
        ok
    }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    metaAnswer(agg).isDefined || protoInner.supportCompletePushDown(agg)

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    protoInner.pruneColumns(requiredSchema)
  }

  /** LIMIT pushdown as FILE-INDEX pruning: an UNFILTERED `LIMIT n` is
    * satisfied by ANY n rows, so when the row-count sidecar covers the
    * snapshot, build() plans over the minimal file subset whose counts
    * reach n instead of the whole table — at 10⁶ files, `SELECT * …
    * LIMIT 10` plans ONE file. Spark keeps its own Limit on top
    * (`isPartiallyPushed` = true), so row semantics are exact; a query
    * with any filter refuses the push (rows matching the residual
    * predicate could live only in dropped files).
    */
  private var limit: Option[Int] = None

  override def pushLimit(n: Int): Boolean = {
    if (filters.isEmpty && n >= 0) { limit = Some(n); true } else false
  }

  override def isPartiallyPushed(): Boolean = true

  /** Per-column must-hold [lo, hi] bounds from the pushed conjuncts,
    * expressed in the ZONE-STAT domain ([[graft.table.ZoneMaps]]):
    * integral columns as themselves, timestamps as epoch SECONDS
    * (literals hold MICROS — floor-divide both ends; the stat cast
    * truncates and floor is monotone, so every row in a micros range
    * has its seconds-stat in the floored range), dates as epoch DAYS
    * (literal identity), short decimals as their UNSCALED value
    * (literal value × 10^scale with DIRECTIONAL rounding — ceil on
    * lower bounds, floor on upper — so a fractional bound like
    * `dec > 12.301` prunes exactly). Columns of any other type derive
    * no bounds and are never pruned on.
    */
  private def bounds: Map[String, (Long, Long)] = {
    import org.apache.spark.sql.types.{ByteType, DateType, DecimalType, IntegerType, LongType, ShortType, TimestampType}
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // (attr, cmp, literal) normalized so the attribute is on the LEFT
    sealed trait Cmp
    object EQ extends Cmp; object GT extends Cmp; object GE extends Cmp
    object LT extends Cmp; object LE extends Cmp
    val cmps: Seq[(CAttr, Cmp, CLit)] = filters.flatMap(conjuncts).flatMap {
      case CEq(a: CAttr, l: CLit) => Seq((a, EQ, l))
      case CEq(l: CLit, a: CAttr) => Seq((a, EQ, l))
      case CGt(a: CAttr, l: CLit) => Seq((a, GT, l))
      case CGt(l: CLit, a: CAttr) => Seq((a, LT, l))
      case CGe(a: CAttr, l: CLit) => Seq((a, GE, l))
      case CGe(l: CLit, a: CAttr) => Seq((a, LE, l))
      case CLt(a: CAttr, l: CLit) => Seq((a, LT, l))
      case CLt(l: CLit, a: CAttr) => Seq((a, GT, l))
      case CLe(a: CAttr, l: CLit) => Seq((a, LE, l))
      case CLe(l: CLit, a: CAttr) => Seq((a, GE, l))
      case _ => Nil
    }
    def longOf(l: CLit): Option[Long] = l.value match {
      case null => None
      case b: java.lang.Byte => Some(b.longValue)
      case s: java.lang.Short => Some(s.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case j: java.lang.Long => Some(j.longValue)
      case _ => None
    }
    // closed stat-domain range from an exact long in the SAME domain
    def fromLong(x: Long, cmp: Cmp): Option[(Long, Long)] = cmp match {
      case EQ => Some((x, x))
      case GE => Some((x, Long.MaxValue))
      case GT => if (x == Long.MaxValue) None else Some((x + 1, Long.MaxValue))
      case LE => Some((Long.MinValue, x))
      case LT => if (x == Long.MinValue) None else Some((Long.MinValue, x - 1))
    }
    def fd(m: Long): Long = Math.floorDiv(m, 1000000L)
    val statDomain = cmps.flatMap { case (a, cmp, l) =>
      val range: Option[(Long, Long)] = a.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType =>
          longOf(l).flatMap(fromLong(_, cmp))
        case TimestampType =>
          // tighten strict bounds by 1 in the exact micros domain,
          // THEN floor the finite end into seconds
          longOf(l).flatMap(fromLong(_, cmp)).map { case (lo, hi) =>
            (if (lo == Long.MinValue) lo else fd(lo),
             if (hi == Long.MaxValue) hi else fd(hi))
          }
        case d: DecimalType if d.precision <= 18 =>
          val v = l.value match {
            case dec: org.apache.spark.sql.types.Decimal => Some(dec.toBigDecimal)
            case _ => longOf(l).map(BigDecimal(_))
          }
          v.map { bd =>
            import scala.math.BigDecimal.RoundingMode.{CEILING, FLOOR}
            val scaled = bd * BigDecimal(10).pow(d.scale)
            // unscaled column values are bounded by 10^precision, so an
            // out-of-long-range literal clamps to the long endpoints —
            // which then provably miss every real stat (prune all) or
            // cover everything (prune none), both sound
            def clamp(x: BigDecimal): Long =
              if (x > BigDecimal(Long.MaxValue)) Long.MaxValue
              else if (x < BigDecimal(Long.MinValue)) Long.MinValue
              else x.toLong
            val fl = clamp(scaled.setScale(0, FLOOR))
            val ce = clamp(scaled.setScale(0, CEILING))
            cmp match {
              case EQ => (ce, fl) // empty when fractional: nothing matches
              case GE => (ce, Long.MaxValue)
              case GT => (if (fl == Long.MaxValue) fl else fl + 1, Long.MaxValue)
              case LE => (Long.MinValue, fl)
              case LT => (Long.MinValue, if (ce == Long.MinValue) ce else ce - 1)
            }
          }
        case _ => None
      }
      range.map(a.name -> _)
    }
    statDomain.groupBy(_._1).view.mapValues { bs =>
      (bs.map(_._2._1).max, bs.map(_._2._2).min)
    }.toMap
  }

  /** Per-column must-hold string bounds from the pushed conjuncts —
    * the [[graft.table.StrZones]] twin of [[bounds]]: eq/gt/ge/lt/le
    * against string literals (both orientations) plus `startsWith`
    * (prefix p ⇒ [p, increment(p)]). Strict comparisons widen to their
    * closed superset — sound, marginally less tight. None = that side
    * unbounded; per column the tightest lows/highs combine in
    * CODE-POINT order (the order Spark compares strings in).
    */
  private def strBounds: Map[String, (Option[String], Option[String])] = {
    import org.apache.spark.sql.catalyst.expressions.{StartsWith => CSw}
    import org.apache.spark.sql.types.StringType
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def str(l: CLit): Option[String] = l.value match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case _ => None
    }
    val ranges: Seq[(String, (Option[String], Option[String]))] =
      filters.flatMap(conjuncts).flatMap {
        case CEq(a: CAttr, l: CLit) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), Some(v)))
        case CEq(l: CLit, a: CAttr) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), Some(v)))
        case CGt(a: CAttr, l: CLit) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), None))
        case CGe(a: CAttr, l: CLit) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), None))
        case CLt(a: CAttr, l: CLit) if a.dataType == StringType =>
          str(l).map(v => a.name -> (None, Some(v)))
        case CLe(a: CAttr, l: CLit) if a.dataType == StringType =>
          str(l).map(v => a.name -> (None, Some(v)))
        case CGt(l: CLit, a: CAttr) if a.dataType == StringType =>
          str(l).map(v => a.name -> (None, Some(v)))
        case CGe(l: CLit, a: CAttr) if a.dataType == StringType =>
          str(l).map(v => a.name -> (None, Some(v)))
        case CLt(l: CLit, a: CAttr) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), None))
        case CLe(l: CLit, a: CAttr) if a.dataType == StringType =>
          str(l).map(v => a.name -> (Some(v), None))
        case CSw(a: CAttr, l: CLit) =>
          str(l).filter(_.nonEmpty).map(p =>
            a.name -> (Some(p), graft.table.StrZones.increment(
              graft.table.StrZones.prefix(p))))
        case _ => Nil
      }
    ranges.groupBy(_._1).view.mapValues { bs =>
      val los = bs.flatMap(_._2._1)
      val his = bs.flatMap(_._2._2)
      // None = unbounded: absent lows/highs stay unbounded; present
      // ones combine to the tightest in code-point order
      (if (los.isEmpty) None else Some(los.max(cpOrdering)),
        if (his.isEmpty) None else Some(his.min(cpOrdering)))
    }.toMap
  }

  private val cpOrdering: Ordering[String] =
    (a: String, b: String) => graft.table.StrZones.cpCompare(a, b)

  /** Equality conjuncts `col = lit` (both orientations) from the
    * pushed filters, as (column, Scala literal) probes for the
    * Bloom-filter index ([[Versioned.bloomPrunedFiles]]) — the
    * point-lookup complement of the zone bounds above: zones need the
    * layout clustered on the column to bite, a bloom rules files out
    * for a random-distributed high-cardinality key too. NULL literals
    * are skipped (`col = NULL` matches nothing and Spark plans it
    * away before pushdown anyway).
    */
  private def eqProbes: Seq[(String, Any)] = {
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def scalaOf(l: CLit): Option[Any] = Option(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType))
    filters.flatMap(conjuncts).flatMap {
      case CEq(a: CAttr, l: CLit) => scalaOf(l).map(a.name -> _)
      case CEq(l: CLit, a: CAttr) => scalaOf(l).map(a.name -> _)
      case _ => Nil
    }
  }

  /** IN-list conjuncts `col IN (lit, …)` (and their post-OptimizeIn
    * `InSet` form) from the pushed filters, as (attribute, non-null
    * CATALYST element values) — the disjunctive complement of
    * [[eqProbes]]/[[bounds]]: each index prunes to the UNION of its
    * per-element point probes (long zones in the stat domain, string
    * zones in code-point order, blooms by typed hash), so
    * `k IN (a, b, c)` plans only files that might hold at least one
    * element. NULL elements drop — they never make the predicate TRUE
    * — and a list with any NON-literal element is unminable. Lists
    * longer than [[inListCap]] degrade to the [min, max] span in the
    * orderable domains (a sound superset) and skip the bloom, where k
    * bitset walks per file stop paying for themselves.
    */
  private def inProbes: Seq[(CAttr, Seq[Any])] = {
    import org.apache.spark.sql.catalyst.expressions.{In => CIn, InSet => CInSet, Or => COr}
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def disjuncts(e: CExpr): Seq[CExpr] = e match {
      case COr(l, r) => disjuncts(l) ++ disjuncts(r)
      case other => Seq(other)
    }
    // one disjunct's (attr, element values), when it is a point set
    def pointSet(e: CExpr): Option[(CAttr, Seq[Any])] = e match {
      case CEq(a: CAttr, l: CLit) => Some(a -> Seq(l.value))
      case CEq(l: CLit, a: CAttr) => Some(a -> Seq(l.value))
      case CIn(a: CAttr, list) if list.forall(_.isInstanceOf[CLit]) =>
        Some(a -> list.collect { case CLit(x, _) => x })
      case CInSet(a: CAttr, hset) => Some(a -> hset.toSeq)
      case _ => None
    }
    filters.flatMap(conjuncts).flatMap {
      case CIn(a: CAttr, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[CLit]) =>
        Some(a -> list.collect { case CLit(x, _) if x != null => x })
      case CInSet(a: CAttr, hset) if hset.nonEmpty =>
        Some(a -> hset.toSeq.filter(_ != null))
      case or @ COr(_, _) =>
        // `k = a OR k = b OR k IN (c, d)`: Spark never normalizes a
        // same-attribute OR-equality chain to In, so mine it here —
        // sound only when EVERY disjunct is a point set on the SAME
        // attribute (any other disjunct could match rows anywhere)
        val sets = disjuncts(or).map(pointSet)
        if (sets.forall(_.isDefined)) {
          val flat = sets.flatten
          flat.map(_._1.exprId).distinct match {
            case Seq(_) =>
              Some(flat.head._1 -> flat.flatMap(_._2).filter(_ != null))
            case _ => None
          }
        } else None
      case _ => None
    }.filter(_._2.nonEmpty)
  }

  private val inListCap = 256

  /** Columns with a pushed `IS NOT NULL` conjunct and NO other minable
    * probe — a bounded/equality/IN probe on the column already drops
    * all-NULL-sentinel files, so mining those again would only re-read
    * the sidecar. A bare not-null scan (the post-mergeSchema backfill
    * shape: `WHERE new_col IS NOT NULL`) prunes every pre-widening
    * file from the log alone.
    */
  private def notNullProbes: Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{IsNotNull => CNotNull}
    def conjuncts(e: CExpr): Seq[CExpr] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val covered = bounds.keySet ++ strBounds.keySet ++
      eqProbes.map(_._1).toSet ++ inProbes.map(_._1.name).toSet
    filters.flatMap(conjuncts).collect {
      case CNotNull(a: CAttr) if !covered.contains(a.name) => a.name
    }.distinct
  }

  /** One IN-probe's pruning pass: intersects `live` with the union
    * verdicts of the long-zone, string-zone, and bloom indexes for
    * `a IN (raw…)`. Elements that provably match NO stored value
    * (fractional decimals) drop from the point set; an element the
    * stat domain can't express at all disables that index instead.
    */
  private def pruneInProbe(
      live: Seq[String], name: String,
      dataType: org.apache.spark.sql.types.DataType,
      raw: Seq[Any]): Seq[String] = {
    import org.apache.spark.sql.types.{ByteType, DateType, DecimalType, IntegerType, LongType, ShortType, StringType, TimestampType}
    if (live.isEmpty) return live
    val capped = raw.size > inListCap
    // stat-domain points; None = this attr's type has no long domain
    val longPoints: Option[Seq[Long]] = dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType =>
        Some(raw.map(_.asInstanceOf[Number].longValue))
      case TimestampType =>
        // micros → truncated-seconds stat domain (floor, like bounds)
        Some(raw.map(x => Math.floorDiv(x.asInstanceOf[Number].longValue, 1000000L)))
      case d: DecimalType if d.precision <= 18 =>
        Some(raw.flatMap { x =>
          val scaled = x.asInstanceOf[org.apache.spark.sql.types.Decimal]
            .toBigDecimal * BigDecimal(10).pow(d.scale)
          // a fractional/overflowing element equals no stored unscaled
          // value — it contributes nothing to the disjunction
          if (scaled.isWhole && scaled.abs <= BigDecimal(Long.MaxValue))
            Some(scaled.toLong)
          else None
        })
      case _ => None
    }
    val strPoints: Option[Seq[String]] = dataType match {
      case StringType => Some(raw.map(_.toString))
      case _ => None
    }
    // bucket-tag probe (free — the tag rides the file NAME): when the
    // probed column IS the single-column bucket key, rows equal to any
    // point can only live in the points' buckets. Hash placement is
    // immune to the value locality zones need, so this is the probe
    // that bites on hash-scattered keys — and the one that lets a
    // runtime (DFP) IN-list skip whole buckets of a bucketed fact.
    // Untagged files stay unless the row-count sidecar proves them
    // empty. Type must match the schema exactly (a differently-typed
    // literal hashes differently than the stored key).
    val bucketLive: Seq[String] = Versioned.bucketSpecAt(spark, dir, v) match {
      case Some((Seq(bcol), n)) if bcol.equalsIgnoreCase(name) &&
          raw.size <= 10000 &&
          full.fields.exists(f =>
            f.name.equalsIgnoreCase(name) && f.dataType == dataType) =>
        val ok = raw.map(x =>
          graft.table.GraftBucketFunction.bucketOf(x, dataType, n)).toSet
        lazy val counts = Versioned.rowCountsAt(spark, dir, v)
        live.filter(r => Versioned.bucketOfFile(r) match {
          case Some(b) => ok.contains(b)
          case None => !counts.exists(_.get(r).contains(0L))
        })
      case _ => live
    }
    val zoned = longPoints match {
      case Some(ps) if ps.nonEmpty =>
        val keep =
          (if (capped) Versioned.prunedFiles(spark, dir, v, name, ps.min, ps.max)
           else Versioned.prunedFilesIn(spark, dir, v, name, ps)).toSet
        bucketLive.filter(keep.contains)
      case _ => bucketLive
    }
    val strZoned = strPoints match {
      case Some(ps) if ps.nonEmpty && zoned.nonEmpty =>
        val keep =
          (if (capped) Versioned.strPrunedFiles(spark, dir, v, name,
            Some(ps.min(cpOrdering)), Some(ps.max(cpOrdering)))
           else Versioned.strPrunedFilesIn(spark, dir, v, name, ps)).toSet
        zoned.filter(keep.contains)
      case _ => zoned
    }
    if (capped || strZoned.isEmpty) strZoned
    else {
      val vals = raw.map(x =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(x, dataType))
      val keep = Versioned.bloomPrunedFilesIn(spark, dir, v, name, vals).toSet
      strZoned.filter(keep.contains)
    }
  }

  /** The table's ANALYZEd per-column statistics as the V2 planner
    * shape ([[graft.table.ColStats]] — NDV/nulls/min/max/lengths),
    * served to `Statistics.columnStats()` on every scan this builder
    * produces; Spark's `transformV2Stats` turns them into catalyst
    * `ColumnStat`s for CBO estimation and join reorder. Empty when the
    * table was never analyzed or the scan time-travels below the
    * analyzed version.
    */
  private lazy val v2ColumnStats: java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val m = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      ColumnStatistics]()
    Versioned.colStatsAt(spark, dir, v).foreach(_.foreach { case (c, st) =>
      full.fields.find(_.name.equalsIgnoreCase(c)).foreach { f =>
        def longOpt(o: Option[Long]) = o
          .map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
        def valOpt(o: Option[Long]): java.util.Optional[Object] =
          if (graft.table.ColStats.longDomain(f.dataType))
            o.map(x => java.util.Optional.of(
              graft.table.ColStats.catalystOf(x, f.dataType)
                .asInstanceOf[Object]))
              .getOrElse(java.util.Optional.empty[Object]())
          else java.util.Optional.empty[Object]()
        // equi-height histogram → connector Histogram; transformV2Stats
        // maps it to catalyst's HistogramBin so skewed-predicate
        // selectivity reads off bins instead of assuming uniformity
        val v2Hist: java.util.Optional[
            org.apache.spark.sql.connector.read.colstats.Histogram] =
          (st.histHeight, st.hist) match {
            case (Some(h), Some(statBins)) if statBins.nonEmpty =>
              java.util.Optional.of(
                new org.apache.spark.sql.connector.read.colstats.Histogram {
                  override def height(): Double = h
                  override def bins(): Array[
                      org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                    statBins.map(b =>
                      new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                        override def lo(): Double = b.lo
                        override def hi(): Double = b.hi
                        override def ndv(): Long = b.ndv
                      }).toArray
                })
            case _ => java.util.Optional.empty()
          }
        m.put(
          org.apache.spark.sql.connector.expressions.FieldReference(Seq(f.name)),
          new ColumnStatistics {
            override def distinctCount() = java.util.OptionalLong.of(st.ndv)
            override def nullCount() = java.util.OptionalLong.of(st.nulls)
            override def min(): java.util.Optional[Object] = valOpt(st.min)
            override def max(): java.util.Optional[Object] = valOpt(st.max)
            override def avgLen() = longOpt(st.avgLen)
            override def maxLen() = longOpt(st.maxLen)
            override def histogram(): java.util.Optional[
                org.apache.spark.sql.connector.read.colstats.Histogram] = v2Hist
          })
      }
    })
    m
  }

  /** Live deletion vectors at `v` — see the guard in [[statsOf]]. */
  private lazy val hasDvs: Boolean =
    Versioned.dvsAt(spark, dir, v).nonEmpty

  /** Merges `inner`'s size estimate, an EXACT `numRows` from the
    * row-count sidecar over the planned `files` (the parquet FileScan
    * never reports one, and without a child row count the CBO's filter
    * and join estimation bail to size-only), and [[v2ColumnStats]].
    */
  private def statsOf(
      inner: Scan, files: Seq[String]): org.apache.spark.sql.connector.read.Statistics = {
    val (size, rows0) = inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        val st = s.estimateStatistics()
        (st.sizeInBytes(), st.numRows())
      case _ =>
        (java.util.OptionalLong.empty(), java.util.OptionalLong.empty())
    }
    // The sidecar records PHYSICAL rows per file; a MoR-mutated snapshot
    // (live deletion vectors) would overstate. Unreachable today — this
    // builder is only constructed when dvsAt is empty (newScanBuilder
    // routes DV'd snapshots to the V1 bridge) — but the claim of EXACT
    // cardinality is load-bearing for CBO, so guard it here too rather
    // than trust a distant routing decision.
    val rows =
      if (rows0.isPresent) rows0
      else if (hasDvs) java.util.OptionalLong.empty()
      else Versioned.rowCountsAt(spark, dir, v)
        .filter(c => files.forall(c.contains))
        .map(c => java.util.OptionalLong.of(files.map(c).sum))
        .getOrElse(java.util.OptionalLong.empty())
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes() = size
      override def numRows() = rows
      override def columnStats() = v2ColumnStats
    }
  }

  /** Plain-path decorator adding [[v2ColumnStats]] to the delegated
    * parquet scan's own statistics — used only when the table carries
    * ANALYZEd stats (zero overhead otherwise).
    */
  private final class ColStatsScan(inner: Scan, files: Seq[String]) extends Scan
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    override def readSchema(): StructType = inner.readSchema()
    override def toBatch: org.apache.spark.sql.connector.read.Batch =
      inner.toBatch
    override def description(): String = s"GraftColStats(${inner.description()})"
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      inner.columnarSupportMode()
    override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      inner.supportedCustomMetrics()
    override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      inner.reportDriverMetrics()
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
      statsOf(inner, files)
  }

  override def build(): Scan = metaAgg match {
    case Some((aggSchema, row)) =>
      // log-answered aggregate: one driver-local row, zero files opened
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
          Array(row)
        override def readSchema(): StructType = aggSchema
        override def description(): String =
          s"GraftMetaAggScan ${aggSchema.fieldNames.mkString(", ")} (log-only)"
      }
    case None =>
      val longPruned = bounds.foldLeft(allFiles) { case (live, (c, (lo, hi))) =>
        if (lo > hi) Nil
        else {
          val keep = Versioned.prunedFiles(spark, dir, v, c, lo, hi).toSet
          live.filter(keep.contains)
        }
      }
      val strPruned = strBounds.foldLeft(longPruned) {
        case (live, (c, (qLo, qHi))) =>
          // contradictory conjuncts (lo above hi in code-point order)
          // can match nothing
          if (qLo.zip(qHi).exists { case (l, h) =>
              graft.table.StrZones.cpCompare(l, h) > 0 }) Nil
          else {
            val keep = Versioned.strPrunedFiles(spark, dir, v, c, qLo, qHi).toSet
            live.filter(keep.contains)
          }
      }
      // bloom point-lookups rule out what zones can't (an unclustered
      // high-cardinality key spans every file's range); files the
      // build never statted always stay in, so this only narrows
      val bloomPruned = eqProbes.foldLeft(strPruned) {
        case (live, _) if live.isEmpty => live
        case (live, (c, value)) =>
          val keep = Versioned.bloomPrunedFiles(spark, dir, v, c, value).toSet
          live.filter(keep.contains)
      }
      // IN-lists prune to the union of their per-element point probes
      // across all three indexes (zones, string zones, blooms)
      val inPruned = inProbes.foldLeft(bloomPruned) {
        case (live, (a, raw)) => pruneInProbe(live, a.name, a.dataType, raw)
      }
      // BUCKET-LAYOUT point pruning — data skipping the hash layout
      // gives for free: a row with `k = v` can only live in bucket
      // pmod(murmur3(v), n)'s files, so an equality/IN probe on the
      // bucket column keeps exactly the probed buckets' files (plus
      // untagged files, where rows may sit anywhere). No index, no
      // sidecar read — at 100 TB a point lookup on the bucket key
      // opens 1/n of the table. Complements zones, which hash
      // scattering defeats on exactly this column.
      val bucketPruned = Versioned.bucketSpecAt(spark, dir, v) match {
        case Some((bcols, n)) if inPruned.nonEmpty =>
          val fields = bcols.map(bc =>
            full.fields.find(f => f.name.equalsIgnoreCase(bc) &&
              graft.table.GraftBucketFunction.supportedKeyType(f.dataType)))
          if (fields.exists(_.isEmpty)) inPruned
          else {
            // catalyst-valued point sets per key column: bare
            // equalities plus the IN/InSet/OR-chain sets inProbes
            // already mines (its values are catalyst-typed)
            def conjuncts(e: CExpr): Seq[CExpr] = e match {
              case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
              case other => Seq(other)
            }
            def pointsOf(name: String): Seq[Seq[Any]] = {
              val eqs = filters.flatMap(conjuncts).collect {
                case CEq(a: CAttr, l: CLit)
                    if a.name.equalsIgnoreCase(name) && l.value != null =>
                  Seq(l.value)
                case CEq(l: CLit, a: CAttr)
                    if a.name.equalsIgnoreCase(name) && l.value != null =>
                  Seq(l.value)
              }
              eqs ++ inProbes.collect {
                case (a, raw) if a.name.equalsIgnoreCase(name) &&
                  raw.nonEmpty => raw
              }
            }
            // every key column must be point-bounded; the admissible
            // buckets are those of the CROSS PRODUCT of the per-column
            // sets (capped — a huge product prunes nothing anyway)
            val perCol: Seq[Seq[Any]] = fields.flatten.map { f =>
              val sets = pointsOf(f.name)
              if (sets.isEmpty) Seq.empty
              else sets.map(_.toSet).reduce(_ intersect _).toSeq
            }
            val product = perCol.map(_.size.toLong).product
            if (perCol.exists(_.isEmpty) || product > 256L) inPruned
            else {
              val combos = perCol.foldLeft(Seq(Seq.empty[Any])) {
                (acc, vs) => acc.flatMap(c => vs.map(c :+ _))
              }
              val ok = combos.map(c => graft.table.GraftBucketFunction
                .bucketOf(c.zip(fields.flatten.map(_.dataType)), n)).toSet
              // untagged files stay (rows could sit anywhere) unless
              // the row-count sidecar proves them EMPTY — the
              // catalog's v1 CREATE file shape
              lazy val counts = Versioned.rowCountsAt(spark, dir, v)
              inPruned.filter(r => Versioned.bucketOfFile(r) match {
                case Some(b) => ok.contains(b)
                case None => !counts.exists(_.get(r).contains(0L))
              })
            }
          }
        case _ => inPruned
      }
      // bare IS NOT NULL conjuncts drop all-NULL-sentinel files
      val nnPruned = notNullProbes.foldLeft(bucketPruned) {
        case (live, _) if live.isEmpty => live
        case (live, c) =>
          val keep = Versioned.notNullPrunedFiles(spark, dir, v, c).toSet
          live.filter(keep.contains)
      }
      val pruned = limit match {
        case Some(n) if filters.isEmpty && nnPruned.nonEmpty =>
          Versioned.rowCountsAt(spark, dir, v) match {
            case Some(counts) =>
              if (n == 0) Nil
              else {
                // deterministic order; take files while the rows BEFORE
                // each still fall short of the limit. Zero-count files
                // never satisfy it alone, so the accumulate-then-stop
                // shape keeps taking until coverage (or everything).
                var acc = 0L
                nnPruned.sorted.takeWhile { f =>
                  val take = acc < n
                  acc += counts(f)
                  take
                }
              }
            case None => nnPruned // uncovered snapshot: never guess
          }
        case _ => nnPruned
      }
      def rebuilt(fs: Seq[String]): Scan = {
        val real = mkInner(fs)
        if (filters.nonEmpty) real.pushFilters(filters)
        aggregation.foreach(real.pushAggregation)
        required.foreach(real.pruneColumns)
        real.build()
      }
      // join-driven runtime file skipping (Delta's dynamic file
      // pruning analog): when a sidecar indexes any column, advertise
      // those columns as runtime-filterable so a broadcast join feeds
      // its build-side keys back as an IN probe before any pruned-out
      // fact file is opened. Skipped under aggregate/limit pushdown
      // (their scans answer from metadata or a capped subset already)
      // and on unindexed tables (zero overhead).
      val runtimeCols =
        if (aggregation.nonEmpty || limit.nonEmpty) Seq.empty[String]
        else {
          // a single-column bucket key is runtime-filterable with NO
          // sidecar at all: the tag probe answers from file names
          // (pruneInProbe keeps untagged files unless provably empty)
          val bucketKey = Versioned.bucketSpecAt(spark, dir, v).collect {
            case (Seq(c), _) => full.fields.collectFirst {
              case f if f.name.equalsIgnoreCase(c) => f.name
            }
          }.flatten
          (Versioned.skippingColumnsAt(spark, dir, v) ++ bucketKey).distinct
        }
      // storage-partitioned-join report: when the snapshot declares a
      // bucket layout and EVERY live (post-pruning) file carries its
      // bucket tag, the scan proves co-partitioning to the planner —
      // a join of two tables bucketed by the same key type and count
      // then plans with NO shuffle on either side (see BucketKeyedScan).
      // Untagged files (row-rewriting maintenance outputs) soundly
      // disable the report until Versioned.rebucket re-tags them.
      // (key column, numBuckets, tagged live files): reportable when
      // the key type binds the shared hash and every live file either
      // carries an in-range tag or provably holds ZERO rows (the
      // catalog's v1 CREATE commit writes one empty untagged file —
      // the row-count sidecar vouches for it, and a 0-row file can be
      // dropped from any scan without changing its answer)
      // SINGLE-column specs only — settled by EXPERIMENT, not design
      // taste: reporting KeyGroupedPartitioning(bucket(8, k1, k2)) from
      // both sides of a two-column co-bucketed join still plans
      // `Exchange hashpartitioning(k1, k2)` on BOTH sides under every
      // v2.bucketing conf (Spark 4.1.2, round-16 run), because
      // KeyGroupedPartitioning.satisfies0 requires every partition
      // expression to have collectLeaves().size == 1 (verified in the
      // shipped bytecode: $anonfun$satisfies0$7 compares the leaf count
      // against iconst_1) — a multi-argument transform has one leaf PER
      // KEY and can never satisfy a ClusteredDistribution. Reporting it
      // anyway is strictly worse than staying silent: the join shuffles
      // regardless, while every non-join consumer gets its task count
      // capped at numBuckets. Multi-column layouts keep their other
      // dividends (composite point pruning, deterministic placement)
      // without the report.
      // Gate on BOTH Spark's SPJ switch (spark.sql.sources.v2.bucketing
      // .enabled — default TRUE since Spark 4) and an explicit
      // preserve-grouping opt-in (default FALSE, Iceberg's
      // preserveDataGrouping design): once a scan reports
      // KeyGroupedPartitioning, Spark's exec-side grouping caps task
      // count at the bucket count for EVERY consumer, join or not — so
      // a plain `SELECT … WHERE …` over a 100 TB bucketed fact would
      // scan on numBuckets tasks for zero benefit. Sessions that want
      // the shuffle-free join set the opt-in; everyone else keeps full
      // split parallelism, runtime file skipping, and bucket-tag
      // pruning. SQLConf.get reads the planning session's conf (scans
      // are built at planning time).
      val preserveGrouping = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(VersionedBatchTable.PreserveGroupingKey, "false")
        .equalsIgnoreCase("true")
      val spjPlan: Option[(Seq[String], Int, Seq[String])] =
        if (aggregation.nonEmpty || limit.nonEmpty || !preserveGrouping ||
            !org.apache.spark.sql.internal.SQLConf.get.v2BucketingEnabled) None
        else Versioned.bucketSpecAt(spark, dir, v)
          .filter(_._1.size == 1).flatMap { case (cols, n) =>
          val keyNames = cols.map(c =>
            full.fields.find(f => f.name.equalsIgnoreCase(c) &&
              graft.table.GraftBucketFunction.supportedKeyType(f.dataType))
              .map(_.name))
          val tagsOk = pruned.forall(r =>
            Versioned.bucketOfFile(r).forall(b => b >= 0 && b < n))
          val untagged = pruned.filter(r => Versioned.bucketOfFile(r).isEmpty)
          lazy val emptiesOk = untagged.isEmpty ||
            Versioned.rowCountsAt(spark, dir, v).exists(counts =>
              untagged.forall(f => counts.get(f).contains(0L)))
          val tagged = pruned.filter(r => Versioned.bucketOfFile(r).isDefined)
          if (keyNames.forall(_.isDefined) && tagsOk && tagged.nonEmpty &&
              emptiesOk)
            Some((keyNames.flatten, n, tagged))
          else None
        }
      spjPlan match {
        case Some((keyNames, n, files)) =>
          new BucketKeyedScan(keyNames, n, files, runtimeCols, rebuilt)
        case None =>
          if (runtimeCols.nonEmpty)
            new RuntimeFilteredScan(pruned, runtimeCols, rebuilt)
          else if (!v2ColumnStats.isEmpty)
            new ColStatsScan(rebuilt(pruned), pruned)
          else rebuilt(pruned)
      }
  }

  /** [[org.apache.spark.sql.connector.read.SupportsReportPartitioning]]
    * wrapper over the delegated parquet scan — the STORAGE-PARTITIONED
    * JOIN surface (SPARK-37375's public contract, the integration shape
    * Iceberg ships): the scan re-slices the planned parquet splits into
    * PER-SPLIT input partitions, each exposing its file's bucket id via
    * `HasPartitionKey`, and reports `KeyGroupedPartitioning(bucket(n,
    * key))`. Spark resolves the bucket transform against the table
    * catalog's FunctionCatalog ([[graft.table.GraftBucketFunction]] —
    * the same `pmod(murmur3(key, 42), n)` the write path assigned rows
    * with), groups the splits by key exec-side (the `groupPartitions`
    * machinery — grouping is Spark's job, not the connector's), and
    * under `spark.sql.sources.v2.bucketing.enabled` two scans reporting
    * the same function + count join WITHOUT shuffling either side. At
    * 100 TB this deletes the dominant cost of a fact-fact join: both
    * shuffles and both sorts plan away, each task joining bucket i
    * against bucket i straight off the scan.
    *
    * Per-split (not pre-grouped-per-bucket) reporting matters twice:
    * (a) skew — under `spark.sql.sources.v2.bucketing
    * .partiallyClusteredDistribution.enabled` Spark keeps the larger
    * side's splits UNGROUPED and replicates the smaller side's matching
    * group, so one hot bucket no longer serializes the join onto a
    * single task; (b) a consumer that doesn't take the report (grouping
    * only happens when the exec side key-groups) falls back to one task
    * per split — full scan parallelism, not a numBuckets cap.
    *
    * The scan also keeps [[SupportsRuntimeV2Filtering]] (dynamic file
    * pruning composes with SPJ: runtime-dropped files only ever shrink
    * a bucket's split list, never change a surviving split's key, which
    * is exactly the subset contract BatchScanExec enforces after
    * runtime filtering).
    */
  private final class BucketKeyedScan(
      keyNames: Seq[String], numBuckets: Int, initial: Seq[String],
      runtimeAttrs: Seq[String], rebuild: Seq[String] => Scan)
      extends Scan
      with org.apache.spark.sql.connector.read.SupportsReportPartitioning
      with org.apache.spark.sql.connector.read.SupportsReportStatistics
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}
    import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
    import org.apache.spark.sql.execution.datasources.FilePartition

    private var files = initial
    private var inner = rebuild(initial)
    private def presentBuckets: Int =
      files.flatMap(Versioned.bucketOfFile).distinct.size
    /** Post-filter file count — test/debug introspection. */
    private[graft] def liveFileCount: Int = files.size

    override def readSchema(): StructType = inner.readSchema()
    override def description(): String =
      s"GraftBucketKeyed(bucket($numBuckets, ${keyNames.mkString(", ")}), " +
        s"present=$presentBuckets, files=${files.size}, ${inner.description()})"
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      inner.columnarSupportMode()
    override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      inner.supportedCustomMetrics()
    override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      inner.reportDriverMetrics()

    override def outputPartitioning()
        : org.apache.spark.sql.connector.read.partitioning.Partitioning =
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .bucket(numBuckets, keyNames: _*)),
        presentBuckets)

    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
      statsOf(inner, files)

    override def filterAttributes(): Array[NamedReference] =
      runtimeAttrs.map(a => FieldReference(Seq(a)): NamedReference).toArray
    override def filter(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
      val next = runtimeNarrow(files, predicates)
      if (next.size != files.size) {
        files = next
        inner = rebuild(next)
      }
    }

    override def toBatch: Batch = new Batch {
      private val innerBatch = inner.toBatch
      private lazy val parts: Array[InputPartition] = {
        val pfs = innerBatch.planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"bucketed scan expected FilePartition splits, got $other")
        }
        // re-pack splits WITHIN each bucket at the session's partition
        // sizing (small files coalesce, big buckets stay multi-split),
        // then emit one keyed partition per packed split — Spark's
        // exec-side groupPartitions owns any further grouping
        val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
        var idx = -1
        pfs.groupBy { pf =>
          Versioned.bucketOfFile(pf.filePath.toString).getOrElse(
            throw new IllegalStateException(
              s"untagged file in a bucket-reported scan: ${pf.filePath}"))
        }.toSeq.sortBy(_._1).flatMap { case (b, fs) =>
          FilePartition.getFilePartitions(
              spark, fs.sortBy(-_.length).toIndexedSeq, maxSplit).map { fp =>
            idx += 1
            KeyedFilePartition(FilePartition(idx, fp.files), b): InputPartition
          }
        }.toArray
      }
      override def planInputPartitions(): Array[InputPartition] = parts
      override def createReaderFactory(): PartitionReaderFactory =
        KeyUnwrapReaderFactory(innerBatch.createReaderFactory())
    }
  }

  /** [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
    * wrapper over the delegated parquet scan — Delta's DYNAMIC FILE
    * PRUNING analog. Spark's PartitionPruning rule plants a
    * DynamicPruningSubquery on any equi-join whose other side carries a
    * selective filter and whose key appears in [[filterAttributes]];
    * at execution the subquery's distinct build-side keys arrive here
    * as one V2 `IN` predicate, and the same zone/string-zone/bloom
    * union probes that serve static IN-lists drop every fact file that
    * cannot hold a matching key — BEFORE the batch plans its
    * partitions. At 100 TB: `fact JOIN dim WHERE dim.region = 'EU'`
    * reads the EU files, not the table. Unprunable predicates leave
    * the file set unchanged (the join itself keeps rows exact — this
    * only ever narrows IO).
    */
  private final class RuntimeFilteredScan(
      initial: Seq[String], attrs: Seq[String],
      rebuild: Seq[String] => Scan) extends Scan
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    import org.apache.spark.sql.connector.expressions.{FieldReference, LiteralValue, NamedReference}
    private var files = initial
    private var inner = rebuild(initial)
    /** Post-filter file count — test/debug introspection. */
    private[graft] def liveFileCount: Int = files.size
    override def readSchema(): StructType = inner.readSchema()
    override def toBatch: org.apache.spark.sql.connector.read.Batch =
      inner.toBatch
    override def description(): String =
      s"GraftRuntimeFilterable(files=${files.size}, ${inner.description()})"
    // planner stats: sizeInBytes flows from the (statically pruned)
    // inner parquet scan; numRows answers EXACTLY from the row-count
    // sidecar when it covers every live file — accurate cardinality
    // feeds the broadcast threshold and AQE's initial plan, which at
    // 100 TB decides shuffle-vs-broadcast for every star join
    private lazy val sidecarCounts =
      if (hasDvs) None else Versioned.rowCountsAt(spark, dir, v)
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
      val size = inner match {
        case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
          s.estimateStatistics().sizeInBytes()
        case _ => java.util.OptionalLong.empty()
      }
      val rows = sidecarCounts
        .filter(c => files.forall(c.contains))
        .map(c => files.map(c).sum)
      new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes() = size
        override def numRows() = rows
          .map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
        override def columnStats() = v2ColumnStats
      }
    }
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      inner.columnarSupportMode()
    override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      inner.supportedCustomMetrics()
    override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      inner.reportDriverMetrics()
    override def filterAttributes(): Array[NamedReference] =
      attrs.map(a => FieldReference(Seq(a)): NamedReference).toArray
    override def filter(
        predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
      val next = runtimeNarrow(files, predicates)
      if (next.size != files.size) {
        files = next
        inner = rebuild(next)
      }
    }
  }

  /** Applies the V2 runtime predicates (the IN / `=` shapes
    * translateRuntimeFilterV2 emits, with catalyst-internal literal
    * values) to a live file list through the same zone/string-zone/
    * bloom union probes that serve static IN-lists. Unminable
    * predicates leave the set unchanged — this only ever narrows IO,
    * never the answer. Shared by the plain runtime-filterable scan and
    * the bucket-keyed (SPJ) scan.
    */
  private def runtimeNarrow(
      initial: Seq[String],
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Seq[String] = {
    import org.apache.spark.sql.connector.expressions.{LiteralValue, NamedReference}
    def nameOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    predicates.foldLeft(initial) { (live, p) =>
      val kids = p.children()
      p.name() match {
        // the shape translateRuntimeFilterV2 emits: IN(col, k1…kn)
        // with catalyst-internal literal values
        case "IN" if kids.nonEmpty =>
          nameOf(kids.head) match {
            case Some(c) if kids.tail.forall(_.isInstanceOf[LiteralValue[_]]) =>
              val lits = kids.tail.map(_.asInstanceOf[LiteralValue[_]])
              val raw = lits.map(_.value.asInstanceOf[Any]).filter(_ != null)
              if (raw.isEmpty) live
              else pruneInProbe(live, c, lits.head.dataType, raw.toSeq)
            case _ => live
          }
        case "=" if kids.length == 2 =>
          (nameOf(kids(0)), kids(1)) match {
            case (Some(c), l: LiteralValue[_]) if l.value != null =>
              pruneInProbe(live, c, l.dataType, Seq(l.value))
            case _ => live
          }
        case _ => live // unminable predicate: never widen, never drop
      }
    }
  }
}

/** One bucket of a bucket-reported scan: all parquet splits of the
  * bucket's files as one [[FilePartition]]-shaped input partition,
  * keyed by the bucket id for Spark's `KeyGroupedPartitioning`
  * machinery ([[HasPartitionKey]] — the row is compared/grouped by
  * Spark when aligning the two sides of a storage-partitioned join).
  */
private final case class KeyedFilePartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    bucket: Int)
    extends org.apache.spark.sql.connector.read.InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket))
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Unwraps [[KeyedFilePartition]] back to the [[FilePartition]] the
  * delegated parquet reader factory expects — the reader itself is
  * Spark's own vectorized parquet reader, untouched.
  */
private final case class KeyUnwrapReaderFactory(
    inner: org.apache.spark.sql.connector.read.PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  private def un(p: org.apache.spark.sql.connector.read.InputPartition) =
    p.asInstanceOf[KeyedFilePartition].inner
  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition) =
    inner.createReader(un(p))
  override def createColumnarReader(p: org.apache.spark.sql.connector.read.InputPartition) =
    inner.createColumnarReader(un(p))
  override def supportColumnarReads(p: org.apache.spark.sql.connector.read.InputPartition) =
    inner.supportColumnarReads(un(p))
}

/** Bridges a DataFrame-producing plan that no file scan can express —
  * the DV anti-join of a MoR-mutated snapshot, the snapshot diff of a
  * change-feed read — to the V1 relation API: the inner plan is still
  * built from native parquet scans; only the relation boundary
  * (InternalRow↔Row) is V1-shaped. Column pruning is pushed into the
  * inner plan so those scans read only what the query needs.
  */
private final class V1FrameScanBuilder(
    full: StructType, frame: () => org.apache.spark.sql.DataFrame)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the table's own column order: parquet pruning doesn't
    // care, and stable order keeps `select *` output deterministic
    required = StructType(full.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val pruned = required
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = pruned
        override def buildScan(): RDD[Row] = {
          val df = frame()
          import org.apache.spark.sql.functions.col
          (if (pruned.isEmpty) df else df.select(pruned.fieldNames.map(col).toSeq: _*)).rdd
        }
      }.asInstanceOf[T]
    }
  }
}

/** Batch change-feed table — Delta's batch CDF API shape:
  *
  *   spark.read.format("graft-versioned")
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", 2)       // exclusive diff base
  *     .option("endingVersion", 5)         // default: current head
  *     .load(dir)
  *
  * Rows are `Versioned.changesWithType(from, to)` — the O(changed
  * files) PER-COMMIT diff with Delta's four `_change_type` values
  * (insert / delete / update_preimage / update_postimage — key-bearing
  * rewrites pair their removed/added rows) plus `_commit_version`.
  * An EXPLICIT `startingVersion 0` serves the real per-commit feed
  * from the table's birth (v1's content as inserts tagged 1, then each
  * commit's changes — Delta's batch convention); only an ABSENT start
  * bound (`from < 0` sentinel) means snapshot mode: the full `to`
  * snapshot as inserts tagged with `to` (the rule the streaming CDF
  * source applies to its initial snapshot). The diff is a join/except
  * plan, not a file scan, so it rides the [[V1FrameScanBuilder]]
  * bridge.
  */
private[graft] final class VersionedChangesTable(
    spark: SparkSession, dir: String, from: Long, to: Long,
    cdfSchema: StructType) extends Table with SupportsRead {

  override def name(): String =
    if (from < 0L) s"graft-versioned $dir changes (snapshot@$to)"
    else s"graft-versioned $dir changes ($from, $to]"
  override def schema(): StructType = cdfSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new V1FrameScanBuilder(cdfSchema, () => {
      import org.apache.spark.sql.functions.lit
      if (from < 0L)
        Versioned.readAt(spark, dir, to)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(to))
      else Versioned.changesWithType(spark, dir, from, to)
    })
}

private[graft] object VersionedChangesTable {

  def cdfRequested(options: JMap[String, String]): Boolean =
    Option(new CaseInsensitiveStringMap(options).get("readChangeFeed"))
      .exists(_.toBoolean)

  /** (from, to, schema) for a batch CDF read. `startingVersion` is the
    * exclusive diff base; an EXPLICIT 0 (or a startingTimestamp that
    * resolves below v1) is the per-commit feed from the table's birth
    * and requires v1 still retained. When BOTH start options are
    * absent, `from` is the -1 snapshot-mode sentinel: the full
    * `endingVersion` snapshot as inserts (kept permissive because the
    * STREAMING reader shares this provider's inferSchema and
    * legitimately omits startingVersion for its initial-snapshot
    * mode); `endingVersion` defaults to the head.
    */
  def resolve(spark: SparkSession, dir: String,
      options: JMap[String, String]): (Long, Long, StructType) = {
    val ci = new CaseInsensitiveStringMap(options)
    // timestamp forms resolve through the commit-timestamp index
    // (Delta's startingTimestamp/endingTimestamp): the start is the
    // FIRST commit at or after the instant (minus one — our
    // startingVersion is the exclusive diff base), the end the LAST at
    // or before it. Version and timestamp forms are mutually exclusive
    // per endpoint.
    require(!(ci.containsKey("startingVersion") && ci.containsKey("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    require(!(ci.containsKey("endingVersion") && ci.containsKey("endingTimestamp")),
      "endingVersion and endingTimestamp are mutually exclusive")
    val explicitStart = Option(ci.get("startingVersion")).map(_.toLong)
      .orElse(Option(ci.get("startingTimestamp")).map(t =>
        Versioned.versionSince(spark, dir, Versioned.parseTimestampMillis(t)) - 1L))
    val from = explicitStart.getOrElse(0L)
    val head = Versioned.currentVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $dir"))
    val to = Option(ci.get("endingVersion")).map(_.toLong)
      .orElse(Option(ci.get("endingTimestamp")).map(t =>
        Versioned.versionAsOf(spark, dir, Versioned.parseTimestampMillis(t))))
      .getOrElse(head)
    require(from >= 0 && from <= to,
      s"startingVersion $from must be in [0, endingVersion $to]")
    val vs = Versioned.versions(spark, dir).toSet
    require(from == 0L || vs.contains(from),
      s"startingVersion $from does not exist (vacuumed or never committed) at $dir")
    // an explicit from-birth feed needs the birth commit: a chain
    // vacuum-truncated below v1 cannot serve the per-commit window the
    // caller asked for (Delta refuses beyond-retention starts too)
    require(explicitStart.forall(_ > 0L) || vs.contains(1L),
      s"startingVersion 0 asks for the feed from the table's birth, but " +
        s"commit history below version ${vs.min} is vacuumed at $dir")
    require(vs.contains(to),
      s"endingVersion $to does not exist (vacuumed or never committed) at $dir")
    // union of the two snapshots' schemas (may have evolved between
    // them) + the change column — matching changes()'s output alignment
    val base = VersionedBatchTable.schemaFor(spark, dir, to)
    val older =
      if (from == 0L) new StructType()
      else VersionedBatchTable.schemaFor(spark, dir, from)
    val union = older.fields ++
      base.fields.filterNot(f => older.fieldNames.contains(f.name))
    (explicitStart.getOrElse(-1L), to, StructType(union)
      .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
      .add("_commit_version", org.apache.spark.sql.types.LongType, nullable = false))
  }
}

/** The TableProvider half, mixed into [[VersionedTableSourceProvider]]
  * so ONE registered short name serves batch V2 reads while streaming
  * reads/writes keep falling back to the proven V1 source/sink (the
  * table advertises neither MICRO_BATCH_READ nor STREAMING_WRITE, which
  * is exactly the condition Spark's stream reader/writer use to fall
  * back when the provider also implements the V1 interfaces).
  */
trait VersionedBatchTableProvider extends TableProvider {

  // user-declared schemas must pass through (streaming reads of
  // not-yet-existing tables pin a schema explicitly)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val dir = VersionedBatchTable.pathOf(options)
    if (VersionedChangesTable.cdfRequested(options))
      VersionedChangesTable.resolve(spark, dir, options)._3
    else VersionedBatchTable.resolveVersion(spark, dir, options)
      .map(VersionedBatchTable.schemaFor(spark, dir, _))
      .getOrElse(new StructType())
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val spark = SparkSession.active
    val dir = VersionedBatchTable.pathOf(properties)
    val _ = partitioning
    if (VersionedChangesTable.cdfRequested(properties)) {
      val (from, to, cdfSchema) = VersionedChangesTable.resolve(spark, dir, properties)
      new VersionedChangesTable(spark, dir, from, to, cdfSchema)
    } else {
      val version = VersionedBatchTable.resolveVersion(spark, dir, properties)
      val declared = Option(schema).filter(_.nonEmpty)
      new VersionedBatchTable(spark, dir, version, declared)
    }
  }
}
