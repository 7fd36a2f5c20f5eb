package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deterministic fixed-point PageRank over an undirected pair set —
  * the canonical-document chooser for dedup clusters (rank the
  * near-dup graph, keep the most central copy) and a general
  * importance measure over any similarity graph the engine builds.
  *
  * Scale + determinism: ranks are integer MICRO-units and every
  * operation is long arithmetic (`div`, `*`, `+`) — integer sums are
  * associative/commutative, so the result is independent of partition
  * count and merge order and replayable bit-for-bit in any SQL engine
  * (the same design as the fixed-point k-means trainer,
  * Similarity.scala). Floating-point PageRank can never hash-match
  * across engines: the per-node Σ contrib is summed in shuffle order.
  *
  * Update rule (no dangling-mass redistribution; symmetrized edges
  * give every non-isolated node out-degree ≥ 1):
  * {{{
  *   r_0(v)     = SCALE
  *   r_{t+1}(v) = (15·SCALE) div 100
  *              + (85 · Σ_{u→v} (r_t(u) div deg(u))) div 100
  * }}}
  *
  * Each iteration is one equi-join + one map-side-combinable sum —
  * the standard distributed PageRank shape. Unlike the connected-
  * components fixpoint (which must materialize every round for its
  * driver-side convergence check), the iteration count here is FIXED,
  * so the loop builds ONE linear 5-deep plan executed by a single
  * action — no per-round checkpoint jobs. Only the inputs reused
  * ACROSS iterations (edges, degrees, vertex set) are checkpointed,
  * since a frame referenced k times in one plan is otherwise
  * recomputed k times.
  * Overflow bound: 85 · n · SCALE must stay below 2^63, i.e. up to
  * ~10^11 nodes at SCALE = 10^6 — comfortably past a 100 TB corpus.
  */
object Rank {

  val Scale: Long = 1000000L
  private val Base: Long = 15L * Scale / 100L

  /** @param pairs undirected edges as (id_a, id_b) — symmetrized here
    * @param nodes one column `id`: the full vertex set (isolated nodes
    *              keep the base rank)
    * @param iters fixed iteration count (convergence is geometric in
    *              0.85^t; 5–10 suffices for ranking)
    */
  def pageRank(pairs: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the pair PLAN executes once: checkpoint before the symmetrizing
    // union (a union of two selects of one frame runs it twice)
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val sym = p.select(col("id_a").as("s"), col("id_b").as("d"))
      .unionByName(p.select(col("id_b").as("s"), col("id_a").as("d")))
      .localCheckpoint()
    // edges-with-degree is referenced once per iteration: checkpoint it
    // so iteration k doesn't recompute the degree agg k times
    val symDeg = sym.join(sym.groupBy("s").agg(count(lit(1)).as("dg")), "s")
      .localCheckpoint()
    val vs = nodes.select(col("id").as("v")).localCheckpoint()
    var ranks = vs.select(col("v"), lit(Scale).as("r"))
    for (_ <- 0 until iters) {
      val contribs = symDeg
        .join(ranks.withColumnRenamed("v", "s"), "s")
        .select(col("d").as("v"), expr("r div dg").as("c"))
        .groupBy("v").agg(sum("c").as("c"))
      ranks = vs
        .join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(Base) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    ranks.select(col("v").as("id"), col("r").as("rank_micro"))
  }
}
