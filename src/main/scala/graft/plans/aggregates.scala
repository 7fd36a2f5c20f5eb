package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * DISTINCT hash values seen so far, as a bounded ordered set.
  *
  * Distinct-count estimation at 100 TB cannot afford an exact
  * `count(DISTINCT x)` per group (a full shuffle of every distinct
  * value). The KMV estimator [Bar-Yossef et al. 2002] keeps only the k
  * smallest distinct uniform hashes; if the k-th smallest is h_k over a
  * hash domain of size M, the group held ≈ (k−1)·M/h_k distinct values.
  * The buffer is O(k) per group, `update` and `merge` are associative
  * and commutative, so Spark runs it with map-side partial aggregation
  * like any built-in — the same execution shape as
  * `approx_count_distinct`, but (unlike HyperLogLog++'s private
  * register layout) bit-replayable as plain SQL in any engine: "the k
  * smallest distinct hashes, ascending" is an order-by/limit.
  */
final class KmvBuffer(val k: Int) {
  val set: mutable.TreeSet[Long] = mutable.TreeSet.empty

  def add(v: Long): Unit =
    if (set.size < k) set += v
    else if (v < set.lastKey && !set.contains(v)) { set += v; set -= set.lastKey }

  def mergeIn(other: KmvBuffer): Unit = other.set.foreach(add)
}

/** `graft_kmin(child, k)`: the k smallest distinct values of `child`
  * (LongType) per group, as an ascending array — the KMV sketch state.
  * The estimate itself is derived in the query (`size < k` ⇒ exact,
  * else `(k−1)·M / arr[k]`) so the oracle can replay it verbatim.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    b.mergeIn(other); b
  }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(b.set.toArray)

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.k)
    b.set.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt)
    while (bb.hasRemaining) b.add(bb.getLong)
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}
