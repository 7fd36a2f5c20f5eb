package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

/** The `bucket(numBuckets, col…)` V2 function of graft's storage-
  * partitioned-join surface — the hash the engine's bucketed WRITES
  * assign files with, published through the catalog so Spark's SPJ
  * machinery can prove two scans are co-partitioned.
  *
  * The definition is Spark's own `HashPartitioning` assignment:
  * `pmod(murmur3(col…, seed 42), numBuckets)` — the multi-expression
  * murmur3 FOLD (each column's hash seeds the next) — because the
  * write path produces bucket files with `df.repartition(n, cols…)`,
  * whose partition index IS exactly that expression. One hash on both
  * sides is the whole soundness argument: the value this function
  * computes for a row equals the bucket id of the file the row was
  * written into, so Spark's `KeyGroupedPartitioning` reasoning (join
  * rows only within equal partition keys) matches the physical layout.
  *
  * NULL keys hash like `HashPartitioning` hashes them: the murmur3
  * fold skips a null input, leaving the running seed.
  *
  * `canonicalName` embeds the KEY types: murmur3 of the same number as
  * INT vs LONG differs, so an int-keyed and a long-keyed table are NOT
  * co-partitioned and must not claim function equality (Spark compares
  * canonical names when checking two scans' partitionings).
  */
object GraftBucketFunction extends UnboundFunction {

  /** Key types the bucketed layout accepts — exactly those whose
    * murmur3 fold the write path's `repartition` and
    * [[GraftBucketBound.produceResult]] agree on byte-for-byte.
    */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        DateType | TimestampType => true
    case _ => false
  }

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col...) -> pmod(murmur3(col..., seed 42), numBuckets): " +
      "the bucket id graft's bucketed writes assign rows to " +
      "(HashPartitioning's own expression)"

  /** The bucket a CATALYST-valued composite key lands in — the one
    * definition shared by [[GraftBucketBound.produceResult]] and the
    * scan's bucket-point pruning: rows whose key columns equal
    * `values` can only live in this bucket's files. The fold chains
    * each column's hash as the next one's seed, exactly
    * `Murmur3Hash(exprs, 42)`.
    */
  def bucketOf(values: Seq[(Any, DataType)], n: Int): Int = {
    var h = 42L
    values.foreach { case (v, dt) =>
      if (v != null) h = Murmur3HashFunction.hash(v, dt, h)
    }
    val r = h.toInt % n
    if (r < 0) r + n else r
  }

  /** Single-key convenience (the common case). */
  def bucketOf(value: Any, dt: DataType, n: Int): Int =
    bucketOf(Seq((value, dt)), n)

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket takes (numBuckets, col...), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's numBuckets must be INT, got ${inputType.fields(0).dataType}")
    val keyTypes = inputType.fields.drop(1).map(_.dataType).toSeq
    keyTypes.foreach(t => require(supportedKeyType(t),
      s"bucket key type ${t.catalogString} is not supported — " +
        "integral, string, date, and timestamp keys only"))
    GraftBucketBound(keyTypes)
  }
}

/** See [[GraftBucketFunction]]; one bound instance per key-type list. */
final case class GraftBucketBound(keyTypes: Seq[DataType])
    extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] =
    (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String =
    s"graft.bucket(${keyTypes.map(_.catalogString).mkString(",")})"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer =
    GraftBucketFunction.bucketOf(
      keyTypes.zipWithIndex.map { case (dt, i) =>
        (if (input.isNullAt(i + 1)) null else input.get(i + 1, dt), dt)
      }, input.getInt(0))
}
