package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

/** The `bucket(numBuckets, col)` V2 function of graft's storage-
  * partitioned-join surface — the hash the engine's bucketed WRITES
  * assign files with, published through the catalog so Spark's SPJ
  * machinery can prove two scans are co-partitioned.
  *
  * The definition is Spark's own `HashPartitioning` assignment:
  * `pmod(murmur3(col, seed 42), numBuckets)` — because the write path
  * produces bucket files with `df.repartition(n, col)`, whose partition
  * index IS exactly that expression. One hash on both sides is the
  * whole soundness argument: the value this function computes for a row
  * equals the bucket id of the file the row was written into, so
  * Spark's `KeyGroupedPartitioning` reasoning (join rows only within
  * equal partition keys) matches the physical layout.
  *
  * NULL keys hash like `HashPartitioning` hashes them: the murmur3 fold
  * skips a null input, leaving the seed — bucket `pmod(42, n)`.
  *
  * `canonicalName` embeds the KEY type: murmur3 of the same number as
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
    "bucket(numBuckets, col) -> pmod(murmur3(col, seed 42), numBuckets): " +
      "the bucket id graft's bucketed writes assign rows to " +
      "(HashPartitioning's own expression)"

  /** The bucket a CATALYST-valued key lands in — the one definition
    * shared by [[GraftBucketBound.produceResult]] and the scan's
    * bucket-point pruning ([[org.apache.spark.sql.graft]]): rows with
    * `col = value` can only live in this bucket's files.
    */
  def bucketOf(value: Any, dt: DataType, n: Int): Int = {
    val h: Int =
      if (value == null) 42
      else Murmur3HashFunction.hash(value, dt, 42L).toInt
    val r = h % n
    if (r < 0) r + n else r
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's numBuckets must be INT, got ${inputType.fields(0).dataType}")
    val keyType = inputType.fields(1).dataType
    require(supportedKeyType(keyType),
      s"bucket key type ${keyType.catalogString} is not supported — " +
        "integral, string, date, and timestamp keys only")
    GraftBucketBound(keyType)
  }
}

/** See [[GraftBucketFunction]]; one bound instance per key type. */
final case class GraftBucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    // HashPartitioning's fold: null contributes nothing (seed stays),
    // then the 32-bit hash pmods into [0, n)
    GraftBucketFunction.bucketOf(
      if (input.isNullAt(1)) null else input.get(1, keyType),
      keyType, input.getInt(0))
  }
}
