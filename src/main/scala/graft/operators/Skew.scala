package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.ops.Dedup

/** Skew-resistant joins (SURVEY.md §4 / the 100 TB checklist).
  *
  * A hash-partitioned join sends every row of a hot key to one task; at
  * scale a single pathological key (the null-ish customer, the default
  * product) serializes the stage. AQE's skew-join split handles sort-
  * merge cases adaptively; *salting* is the explicit, planner-
  * independent form: the big side scatters each key across `salts`
  * sub-keys, the small side is replicated `salts` times, and the join
  * key becomes (key, salt) — hot keys now occupy `salts` tasks.
  *
  * Semantics are EXACTLY the plain equi-join's: each big-side row joins
  * the single replica matching its salt. Cost: small side inflated
  * `salts`×(use for dimension-sized right sides), one extra projection
  * on the big side — no extra shuffle.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted against big-side key
    * skew. `saltBy` must be a deterministic big-side expression that
    * varies within a hot key (a row id, a line number) so the key's
    * rows spread evenly; `salts` ≈ the per-key parallelism wanted.
    */
  /** Join types whose semantics survive small-side replication: the
    * output is driven by big-side rows (each matches exactly its salt's
    * replica). Right/full-outer would emit the `salts − 1` unmatched
    * replicas of every small row as spurious null-extended output.
    * Normalized the way Spark's JoinType.apply does (lowercase, strip
    * underscores) so every Spark-accepted alias — "semi", "left_semi",
    * "leftsemi", … — resolves consistently.
    */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross")

  private def normalize(joinType: String): String =
    joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(SupportedJoinTypes.contains(normalize(joinType)),
      s"saltedJoin preserves semantics only for big-side-driven join types " +
        s"(${SupportedJoinTypes.toSeq.sorted.mkString(", ")}); got '$joinType' — " +
        "a right/full outer join would emit every unmatched small-side replica")
    val salt = Dedup.freshName(big.columns ++ small.columns, "__salt")
    val b = big.withColumn(salt, pmod(hash(saltBy), lit(salts)))
    val s = small.withColumn(salt,
      explode(array((0 until salts).map(lit): _*)))
    b.join(s, keys :+ salt, joinType).drop(salt)
  }
}
