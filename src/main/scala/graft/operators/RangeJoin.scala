package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.ops.Dedup

/** Interval range join: left row ⋈ right rows whose `rightTs` falls in
  * the half-open window `[leftTs + lo, leftTs + hi)` within the same
  * key group — "events in the 24 h before each purchase", "readings
  * during each outage".
  *
  * Scale shape: expressed directly (`r >= l + lo AND r < l + hi`) the
  * inequality conjunct forces Spark into a broadcast-nested-loop join —
  * O(|L|·|R|) per key and a driver-sized broadcast. This operator
  * instead quantizes time into buckets of width `hi - lo`: every
  * window spans AT MOST TWO buckets, so the left side explodes into ≤2
  * rows, the right side maps to exactly one bucket, and the join is a
  * plain hash equi-join on (keys, bucket) followed by the exact window
  * predicate. Cost O(|L| + |R| + |matches|) with ordinary shuffle
  * parallelism — the bucketing trick production range-join
  * implementations use (e.g. Databricks' range-join optimization,
  * PostGIS tile joins).
  *
  * The exact predicate re-applied after the equi-join makes the
  * bucketing pure candidate generation: results are identical to the
  * naive inequality join, row for row.
  */
object RangeJoin {

  /** Inner range join on `keys` with `rightTs ∈ [leftTs+lo, leftTs+hi)`.
    * Timestamps are integral (epoch micros per SURVEY §7.4); `lo < hi`.
    * Output: all left columns plus `payload` from the right side.
    */
  def joinRange(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lo: Long,
      hi: Long,
      payload: Seq[String]): DataFrame = {
    require(lo < hi, s"empty window: lo=$lo must be < hi=$hi")
    require(payload.nonEmpty, "range join needs at least one payload column")
    val dup = (rightTs +: payload).distinct.filter(left.columns.contains)
    require(dup.isEmpty,
      s"right-side columns ${dup.mkString(",")} collide with left-side names" +
        " — rename one side before joining")

    val width = hi - lo
    val bucket = Dedup.freshName(left.columns ++ right.columns, "__rj_bucket")
    // floorDiv, not `/`: window starts can be negative-epoch and Scala's
    // integer division truncates toward zero, splitting bucket -1 in two
    def bucketOf(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(width)).cast("long")

    // [l+lo, l+hi) covers bucket(l+lo) and bucket(l+hi-1): equal for
    // windows aligned inside one bucket, adjacent otherwise
    val l = left.withColumn(bucket,
      explode(array_distinct(array(
        bucketOf(col(leftTs) + lit(lo)),
        bucketOf(col(leftTs) + lit(hi) - lit(1))))))
    val r = right.select(
      (keys.map(col) :+ bucketOf(col(rightTs)).as(bucket)) ++
        (rightTs +: payload.filterNot(_ == rightTs)).map(col): _*)

    l.join(r, keys :+ bucket)
      .filter(col(rightTs) >= col(leftTs) + lit(lo) &&
        col(rightTs) < col(leftTs) + lit(hi))
      .drop((bucket +: (if (payload.contains(rightTs)) Nil else Seq(rightTs))): _*)
  }
}
