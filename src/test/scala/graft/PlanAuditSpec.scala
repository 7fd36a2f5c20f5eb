package graft

import graft.queries.{Core, Extensions, Temporal}

/** Physical-plan audit of every declared query (SURVEY.md §4): the
  * scale properties the engine is designed around must be visible in
  * the plan, not just hoped for. Runs against sf0.001 — plans don't
  * change shape with SF (AQE may refine them at runtime, only ever in
  * the cheaper direction).
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val fn = SparkEntry.queries(name)
    fn(spark, sf).queryExecution.executedPlan.toString
  }

  /** Queries whose DESIGN includes a bounded-small broadcast side joined
    * without an equi-condition — BroadcastNestedLoopJoin against a
    * bounded side is the intended plan there, not an O(n²) smell:
    * top-k joins the corpus to a small broadcast query set, IVF scores
    * against nlist broadcast centroids, and the merge-split queries
    * cross-join a single-row broadcast scalar aggregate (the plan-side
    * replacement for a driver-side count()).
    */
  private val boundedBroadcastByDesign = Set(
    "x_ann_topk", "x_ann_ivf", "x_ann_ivf_trained", "x_ann_recall",
    "x_ann_quantized", "x_semdedup_ivf", "m1_insert_only", "m2_upsert_lww",
    "m5_versioned_merge",
    // single-row broadcast scalar aggregate (the global min domain
    // count) cross-joined into the per-domain rate computation
    "x_mixture_sample",
    // same single-row broadcast scalar pattern: vocabulary size
    // (x_lm_bits), the two DSIR normalizers (x_dsir_weights), and the
    // min-cluster count inside temperatureSample (x_cluster_balance)
    "x_lm_bits", "x_dsir_weights", "x_cluster_balance")

  test("no unbounded nested-loop or cartesian join in any declared query") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(boundedBroadcastByDesign)
      .filter { name =>
        val p = plan(name)
        p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
      }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans in: ${offenders.mkString(", ")}")
  }

  test("projection/filter query pushes predicates and prunes columns at the scan") {
    val p = plan("p1_project_filter")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("IsNotNull"), "null filters should reach the parquet scan")
    // pruned read schema: the scan must NOT materialize unused lineitem
    // columns like l_comment-ish extras (schema lists only used fields)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate"),
      s"scan reads columns the query never touches: $readSchema")
  }

  test("star joins broadcast the dimension side") {
    assert(plan("j5_revenue_rollup").contains("BroadcastHashJoin"))
    assert(plan("a7_conditional_distinct").contains("Join")) // shape smoke
  }

  test("blocked all-pairs cosine is an equi-join, with the pair table broadcast") {
    val p = plan("x_embed_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"))
  }

  test("as-of join is a single-exchange merge-scan (no right-side pre-shuffle)") {
    val p = plan("t5_asof_join")
    // exchanges: ONE hashpartitioning on the key for the window, plus
    // the final orderBy's range partitioning — nothing per-side
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange in the as-of plan, got $hashExchanges:\n$p")
  }

  test("w8 rank/navigation battery shares one hash exchange across all windows") {
    val p = plan("w8_rank_nav")
    // all three window specs share PARTITION BY o_custkey → one hash
    // exchange feeds every WindowExec; the only other exchange is the
    // final orderBy's range partitioning
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange in the w8 plan, got $hashExchanges:\n$p")
  }

  test("w9 SCD2 reuses one exchange+sort across both window passes") {
    val p = plan("w9_scd2")
    // lag (run-collapse) and lead (interval close) share the same
    // (user_id → us, event_id) spec; the filter between them preserves
    // order, so the second window must not re-exchange or re-sort
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange in the w9 plan, got $hashExchanges:\n$p")
  }

  test("f23 generate is pipeline-local (no shuffle below the explode)") {
    val p = plan("f23_explode")
    assert(p.contains("Generate"), s"no Generate node in:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 0,
      s"explode should not shuffle (only the final sort repartitions):\n$p")
  }

  test("x_chunk is pipeline-local like f23 (chunks land partitioned with their source)") {
    val p = plan("x_chunk")
    assert(p.contains("Generate"), s"no Generate node in:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 0,
      s"chunking should not shuffle (only the final sort repartitions):\n$p")
  }

  test("x_pack's prefix sum is sharded: base offsets broadcast, no global-order window on data") {
    val p = plan("x_pack")
    assert(p.contains("BroadcastHashJoin"),
      s"per-shard base offsets must join by broadcast:\n$p")
    // exactly one SinglePartition exchange is allowed: the #shards-row
    // base table's own running sum — never the document data
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single <= 1, s"data-sized single-partition exchange in x_pack:\n$p")
  }

  test("cluster-blocked semdedup candidates are a small fraction of exact all-pairs") {
    val emb = graft.queries.Tables.t(spark, sf, "embeddings")
    val n = emb.count()
    // threshold −1 admits every candidate the cluster blocking
    // generates, so this counts candidate-generation COMPUTE (the
    // x_semdedup weakness being fixed), not the verifier's output
    val candidates = graft.operators.Similarity
      .clusterBlockedPairs(emb, "vec_id", "embedding", threshold = -1.0, nlist = 32)
      .count()
    val exact = n * (n - 1) / 2
    assert(candidates * 4 <= exact,
      s"cluster blocking generated $candidates of $exact exact pairs — " +
        "the scale path must cut candidate compute, not relabel it")
  }

  test("x_chunk row width stays bounded when documents grow 100×") {
    import spark.implicits._
    // a synthetic documents table whose doc is ~100× the chunk size:
    // output rows must stay chunk-sized (the slice bounds them), never
    // document-sized — the generated-row-width contract at scale
    val d = tmpDir("chunk_long")
    val n = 3200
    val longDoc = (1 to n).map(i => s"tok$i").mkString(" ")
    Seq((1L, longDoc), (2L, "short doc")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.queries.Extensions.chunk(spark, d).collect()
    val expected = ((n - 32) + 23) / 24 + 1
    assert(rows.count(_.getLong(0) == 1L) == expected,
      s"ceil-stride chunk count: got ${rows.count(_.getLong(0) == 1L)}, want $expected")
    assert(rows.forall(_.getAs[Long]("chunk_tok") <= 32L),
      "a chunk exceeded ChunkSize tokens")
    val maxLen = rows.map(_.getAs[String]("chunk_text").length).max
    assert(maxLen <= 32 * 8,
      s"chunk_text width $maxLen grew with the document, not the chunk size")
  }

  test("x_redact is a map-only pass (no shuffle below the declared sort)") {
    val p = plan("x_redact")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 0,
      s"redaction must not shuffle (only the final sort repartitions):\n$p")
  }

  test("x_lm_bits serves a pruned LM: distributed top-K, broadcast scoring joins") {
    val p = plan("x_lm_bits")
    // the serving prune must be TakeOrderedAndProject (per-partition
    // partial top-K, K rows to the driver), never a global sort+limit
    assert(p.contains("TakeOrderedAndProject"),
      s"LM prune is not a distributed top-K:\n$p")
    // scoring joins build on the vocabulary-bounded LM side
    assert(p.contains("BroadcastHashJoin"), s"scoring should broadcast the LM:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join belongs in LM scoring — both build sides are vocab-bounded")
  }

  test("x_quality_classifier rounds broadcast the bucket-bounded weight vector") {
    val p = plan("x_quality_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"weight joins must broadcast (weights are bucket-constant rows):\n$p")
  }

  test("x_pack_nosplit packs shards independently: one data exchange, no window") {
    val p = plan("x_pack_nosplit")
    assert(!p.contains("Window"),
      "the greedy fold must be a per-shard aggregate, not a window function")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly ONE shard-grouping exchange, found $hashExchanges:\n$p")
  }

  test("every declared query plans successfully at sf0.001") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name) // throws on analysis failure
      assert(p.nonEmpty, s"$name produced an empty plan")
    }
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
