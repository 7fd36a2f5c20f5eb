package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.Text

/** Deterministic train/val/test split assignment — a training-data
  * pipeline needs splits that are (a) a pure function of the example id
  * (reproducible across runs, engines, and cluster layouts — never
  * `rand()`, whose draw depends on partitioning), (b) stable under
  * corpus growth (adding documents never reassigns an existing one),
  * and (c) uniform (the hash spreads ids evenly, so split sizes land
  * within sampling error of the requested percentages at any scale).
  *
  * Assignment: `bucket = polyhash(id || ':' || salt) mod 100`, then
  * train `[0, trainPct)`, val `[trainPct, trainPct+valPct)`, test the
  * rest. The salt decorrelates independent splits of the same corpus.
  * Embarrassingly parallel — a projection, no shuffle.
  */
object Splits {

  def assign(
      docs: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10,
      salt: String = "graft"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = pmod(
      Text.polyHash(concat(col(idCol).cast("string"), lit(":" + salt))), lit(100L))
    docs.select(
      col(idCol),
      bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Temperature-based domain rebalancing (τ = 0.5, "sqrt sampling") —
    * the mixture pass a pretraining pipeline runs so a dominant domain
    * does not drown the tail: target weights `p_d ∝ n_d^τ`, realized
    * as a per-domain KEEP RATE `sqrt(n_min / n_d)` (the smallest
    * domain keeps everything; a domain 100× larger keeps 1/10 — its
    * post-sample share still grows with size, sublinearly). Selection
    * is the deterministic [[assign]] discipline: a pure hash of the
    * id, never `rand()` — reproducible across engines and layouts,
    * stable per document under resampling. The rate quantizes to
    * integer parts-per-million via one `sqrt` + one division + `floor`
    * (both IEEE-correctly-rounded, so independent engines agree bit
    * for bit).
    *
    * Cost shape at 100 TB: one map-side-combinable count per domain
    * (tiny result, broadcast back), then a projection — the document
    * table is scanned once and never shuffled.
    *
    * Returns per-domain accounting: domain, n_docs, rate_ppm, n_kept.
    */
  def temperatureSample(
      docs: DataFrame,
      domainCol: String,
      idCol: String,
      salt: String = "mix"): DataFrame = {
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("n_min"))
    val rated = counts.crossJoin(broadcast(minN))
      .withColumn("rate_ppm",
        floor(lit(1000000.0) *
          sqrt(col("n_min").cast("double") / col("n_docs").cast("double")))
          .cast("long"))
    docs.select(col(domainCol), col(idCol))
      .join(broadcast(rated), Seq(domainCol))
      .withColumn("kept",
        (pmod(Text.polyHash(
          concat(col(idCol).cast("string"), lit(":" + salt))),
          lit(1000000L)) < col("rate_ppm")).cast("long"))
      .groupBy(col(domainCol), col("n_docs"), col("rate_ppm"))
      .agg(sum(col("kept")).as("n_kept"))
  }

  /** Deterministic global training-order shuffle: position = rank of a
    * pure hash of the id, ties broken by id — a total order, so every
    * engine and every run agrees on the full permutation. The
    * epoch-ordering pass before sequence packing: no `rand()`, no
    * driver-side state. Epochs vary the polynomial BASE, not a salt
    * suffix: a rolling hash is AFFINE in its input pieces, so two
    * salts of one id differ by a per-length constant and the sort
    * order (the permutation!) would barely change between epochs —
    * a different base is a genuinely different hash family, and each
    * epoch gets an independent order.
    *
    * A bare `Window.orderBy` would rank on ONE partition — the classic
    * scale killer — so the global rank is the two-pass prefix-sum
    * formulation (`pack`'s shape): the hash domain ([0, 1e9+7), the
    * polyHash modulus) range-shards into `Shards` contiguous slices,
    * each slice ranks locally in parallel, per-slice counts (a
    * `Shards`-row frame) prefix-sum into base offsets, and a broadcast
    * join adds the base — the permutation materializes with no global
    * sort barrier beyond the tiny shard table.
    */
  private val ShuffleShards = 64L
  private val PolyHashMod = 1000000007L

  def shuffleOrder(
      docs: DataFrame,
      idCol: String,
      epoch: Int = 0): DataFrame = {
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    val W = org.apache.spark.sql.expressions.Window
    val span = PolyHashMod / ShuffleShards + 1L
    val base = Text.HashBase + 6L * epoch // distinct from HashBase2's 131
    val hashed = docs
      .select(col(idCol), graft.plans.expressions.polyHash(
        concat(col(idCol).cast("string"), lit(":shuffle")), base).as("h"))
      .withColumn("shard", expr(s"h div $span"))
    val bases = hashed.groupBy("shard").agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n"))
        .over(W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "base")
    hashed
      .withColumn("local", row_number().over(
        W.partitionBy("shard").orderBy(col("h").asc, col(idCol).asc)).cast("long"))
      .join(broadcast(bases), "shard")
      .select((col("base") + col("local")).as("position"), col(idCol), col("h"))
  }
}
