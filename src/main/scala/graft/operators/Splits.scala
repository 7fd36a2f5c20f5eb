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
}
