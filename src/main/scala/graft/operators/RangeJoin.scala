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

  /** Interval-OVERLAP join: left interval `[lStart, lEnd]` ⋈ right
    * intervals `[rStart, rEnd]` of the same key group that intersect it
    * (`lStart <= rEnd AND rStart <= lEnd`, closed ends) — "sessions
    * concurrent with this session", "readings during each outage".
    *
    * Blocking: both sides explode into the time buckets their interval
    * covers at width `maxLen` (an upper bound on EITHER side's interval
    * length — enforced, not assumed); two overlapping intervals then
    * share at least one bucket, so a distinct-pair equi-join on
    * (keys, bucket) followed by the exact predicate reproduces the
    * naive inequality join. Each interval covers at most
    * `len/maxLen + 1 ≤ 2` buckets, so row amplification is bounded by
    * 2× per side regardless of data volume.
    *
    * Output has SET semantics (the final distinct dedups pairs that
    * met in both shared buckets): rows identical across every column
    * collapse — carry a unique id column when multiplicity matters.
    */
  def joinOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      maxLen: Long,
      payload: Seq[String]): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(payload.nonEmpty, "overlap join needs at least one payload column")
    val dup = (Seq(rStart, rEnd) ++ payload).distinct.filter(left.columns.contains)
    require(dup.isEmpty,
      s"right-side columns ${dup.mkString(",")} collide with left-side names" +
        " — rename one side before joining")

    val bucket = Dedup.freshName(left.columns ++ right.columns, "__ov_bucket")
    def bucketOf(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(maxLen)).cast("long")
    def guarded(start: String, end: String, df: DataFrame): DataFrame = {
      // loud failure beats silently missed overlaps: the bound is part
      // of the operator's contract, checked per row in the same pass
      val len = col(end) - col(start)
      df.withColumn(bucket, explode(array_distinct(array(
        when(len.between(0, maxLen), bucketOf(col(start)))
          .otherwise(raise_error(concat(
            lit(s"interval length exceeds maxLen=$maxLen (or is negative): "),
            len.cast("string")))),
        bucketOf(col(end))))))
    }
    val l = guarded(lStart, lEnd, left)
    val r = guarded(rStart, rEnd,
      right.select((keys ++ Seq(rStart, rEnd) ++ payload
        .filterNot(c => c == rStart || c == rEnd)).distinct.map(col): _*))
    l.join(r, keys :+ bucket)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop(bucket)
      .distinct() // adjacent-bucket intervals can pair in two buckets
  }
}
