package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Text

/** Frequency sketching for corpora too large to groupBy by value.
  *
  * A count-min sketch [Cormode & Muthukrishnan 2005] folds a stream of
  * items into a fixed d×w grid of counters: row r counts items by
  * `hash_r(item) mod w`. An item's estimate is the MIN of its d
  * counters — always ≥ the true count (collisions only add), within
  * ε·N with probability 1−δ for w = e/ε, d = ln(1/δ).
  *
  * Scale shape: the sketch build is one map-side-combinable groupBy
  * onto AT MOST d·w rows — the shuffle volume is the sketch size, not
  * the vocabulary. At 100 TB the full token→count table is itself a
  * multi-TB shuffle; the sketch is a few MB regardless of input, can be
  * broadcast, merged across days (counter-wise sum), and queried
  * without touching the corpus again. Hashes are graft's portable
  * polyhash (plans/expressions.scala) so any engine can replay the
  * bucket math bit-for-bit.
  */
object Sketches {

  /** Row-r bucket of an item: polyhash of `item || ':cms' || r`, mod w.
    * The salt suffix makes the d rows d independent hash families while
    * staying a pure-SQL-replayable string hash.
    */
  def cmsBucket(item: Column, r: Int, w: Int): Column =
    pmod(Text.polyHash(concat(item, lit(s":cms$r"))), lit(w.toLong))

  /** Build the d×w sketch over `items(itemCol)`: one row per non-empty
    * (r, bucket) with its counter. ≤ d·w rows regardless of input size.
    */
  def countMinBuild(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"sketch dims must be positive, got d=$d w=$w")
    items
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Estimated count for each row of `probes(itemCol)`: min over the d
    * counters. The sketch side is ≤ d·w rows — broadcast it; the probe
    * side needs d lookups per item, done as one equi-join after
    * exploding each probe into its d (r, bucket) keys.
    */
  def countMinLookup(
      sketch: DataFrame, probes: DataFrame, itemCol: String, d: Int, w: Int,
      estCol: String = "est_n"): DataFrame = {
    require(!probes.columns.contains(estCol),
      s"estimate column '$estCol' collides with a probe column")
    val clash = probes.columns.toSet.intersect(Set("r", "bucket", "n", "__rb", "__r", "__bucket"))
    require(clash.isEmpty,
      s"probe columns ${clash.mkString(",")} collide with sketch-internal names")
    // duplicate probe rows collapse in the final groupBy: probe on the
    // DISTINCT item set (the natural shape for "estimate these tokens")
    probes
      .withColumn("__rb", explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket"))): _*)))
      .select(probes.columns.map(col) :+ col("__rb.r").as("__r") :+
        col("__rb.bucket").as("__bucket"): _*)
      // LEFT join + coalesce-to-zero: an empty bucket never survives
      // countMinBuild's groupBy, so a missing match means a zero
      // counter — and min(…, 0) correctly estimates 0 for items the
      // sketch never saw (true count 0, the standard CMS answer)
      .join(broadcast(sketch), col("__r") === col("r") && col("__bucket") === col("bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as(estCol))
  }
}
