package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.ops.Dedup

/** As-of join: each left row picks the single nearest right row at or
  * before it (backward — the LARGEST `rightTs <= leftTs`) or at or
  * after it (forward — the SMALLEST `rightTs >= leftTs`), within the
  * same key group; `strict` excludes the equal-ts row — the "state at
  * event time" lookup of time-series engines (kdb+ `aj`, Pandas
  * `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Scale shape: the naive formulation is an inequality join — a
  * broadcast-nested-loop in Spark, quadratic per key group — or a
  * per-key sort plus binary search that materializes both sides in
  * memory. This implementation is instead ONE hash exchange of
  * `left ∪ right` on the key, a per-partition sort on
  * (key, ts, side), and a running `last(payload, ignoreNulls)`
  * carry-forward window — i.e. exactly the merge-scan a column-store
  * executes, with cost O((|L|+|R|) log partition) and zero row
  * amplification. On a 1000-executor cluster both inputs stream once;
  * no key group ever has to fit in memory beyond the sort spill.
  *
  * Determinism (SURVEY.md §7.4): among right rows sharing
  * (keys, rightTs) the one with the highest `tiebreak` wins — the
  * window sort ends each equal-ts run on it, so the match is a
  * total-order choice whenever `tiebreak` totally orders right rows
  * within (keys, rightTs).
  */
object AsOf {

  /** Left-outer as-of join.
    *
    * @param left      probe side; all its columns are preserved
    * @param right     build side: `keys ++ rightTs ++ payload` are read
    * @param keys      equi-join key columns present on both sides
    * @param leftTs    left event-time column (any orderable type,
    *                  same type as `rightTs`)
    * @param rightTs   right event-time column
    * @param payload   right columns to carry onto matches (must not
    *                  collide with left column names)
    * @param tiebreak  total-orders right rows within (keys, rightTs);
    *                  highest wins
    * @param strict    `true` excludes the equal-ts right row
    * @param direction `"backward"` (default) matches the latest
    *                  `rightTs <= leftTs`; `"forward"` the earliest
    *                  `rightTs >= leftTs` — the same merge-scan run
    *                  over a descending time sort
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: Column,
      strict: Boolean = false,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(payload.nonEmpty, "asof join needs at least one payload column")
    require(payload.forall(right.columns.contains),
      s"payload ${payload.mkString(",")} must be right-side columns")
    val dup = payload.filter(left.columns.contains)
    require(dup.isEmpty,
      s"payload columns ${dup.mkString(",")} collide with left-side names")

    val taken = (left.columns ++ right.columns).toSeq
    val ts = Dedup.freshName(taken, "__asof_ts")
    val side = Dedup.freshName(taken ++ Seq(ts), "__asof_side")
    val pay = Dedup.freshName(taken ++ Seq(ts, side), "__asof_pay")
    val tb = Dedup.freshName(taken ++ Seq(ts, side, pay), "__asof_tb")

    // `<=`: right sorts BEFORE an equal-ts left row (side 0 < 1) so the
    // carry-forward already holds it; `<`: right sorts after instead.
    // Within equal (ts, side) the sort ends on the HIGHEST tiebreak, so
    // the carry-forward lands on exactly the max_by choice — resolving
    // ts collisions inside the sort the window needs anyway, instead of
    // paying a separate groupBy(keys, ts) shuffle of the right side.
    val rSide = if (strict) 2 else 0
    // Standard ASOF null semantics (kdb+/Pandas/DuckDB): null keys and
    // null timestamps never match. Without this filter the window's
    // partitionBy would group null keys together (matching them against
    // each other where an equi-join would mismatch), and a null rightTs
    // sorts first under the ascending order, carrying its payload onto
    // left rows that have no real preceding match.
    val rightNonNull = (keys :+ rightTs)
      .map(col(_).isNotNull).reduce(_ && _)
    val rPre = right.filter(rightNonNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ts), lit(rSide).as(side),
        struct(payload.map(col): _*).as(pay), tiebreak.as(tb)): _*)
    val payType = rPre.schema(pay).dataType
    val tbType = rPre.schema(tb).dataType
    val lTagged = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(pay, lit(null).cast(payType))
      .withColumn(tb, lit(null).cast(tbType))
    // align to lTagged's schema: keys + ts/side/pay/tb, other left cols null
    val rTagged = rPre.select(lTagged.columns.map {
      case c if rPre.columns.contains(c) => col(c)
      case c => lit(null).cast(lTagged.schema(c).dataType).as(c)
    }: _*)

    // forward = the identical carry-forward scan over DESCENDING time:
    // "most recent preceding row" then means "smallest rightTs at or
    // after leftTs", which is exactly the forward match
    val tsOrd = if (direction == "forward") col(ts).desc else col(ts).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col(side), col(tb))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a left row with a null ts or null key matches NOTHING (same
    // standard semantics as above). The sort alone doesn't guarantee
    // that: under the forward direction's descending order Spark sorts
    // nulls last, so a null-ts left row would otherwise sit after every
    // right row and absorb its carry-forward.
    val leftNull = (keys :+ ts).map(col(_).isNull).reduce(_ || _)
    lTagged.unionByName(rTagged)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .withColumn(pay, when(leftNull, lit(null).cast(payType)).otherwise(col(pay)))
      .select(left.columns.map(col) ++ payload.map(p => col(s"$pay.$p").as(p)): _*)
  }
}
