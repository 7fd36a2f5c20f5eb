package graft

import graft.table.Versioned
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union}

/** The wide-window batch-CDF scale contract: a change-feed window
  * dominated by micro-batch APPEND commits (the shape every streamed
  * bronze tier produces — thousands of commits on a real table) must
  * plan with O(1) scans and O(1) driver log reads PER APPEND COMMIT,
  * not O(checkpoint-interval) log reads and a union branch per commit.
  * [[Versioned.changesWithType]] serves appends from their log
  * add-actions as ONE file scan (per committed schema) and runs the
  * full snapshot diff only for genuine rewrite commits.
  */
class CdfWideWindowSpec extends SparkSpec {

  import spark.implicits._

  private val Appends = 64

  private def buildWide(dir: String): Unit = {
    // v1..v64: micro-batch appends, 4 rows each
    (0 until Appends).foreach { i =>
      Versioned.append(
        (0 until 4).map(j => (i * 4 + j, s"g${(i * 4 + j) % 5}", i))
          .toDF("id", "grp", "batch"), dir)
    }
    // v65: a keyed row-level update (pairs into update_pre/postimage)
    Versioned.updateWhere(spark, dir, col("grp") === "g3",
      Map("batch" -> (col("batch") + 1000)))
    // v66: a copy-on-write delete
    Versioned.deleteWhere(spark, dir, col("grp") === "g4")
  }

  test("wide append-heavy window: driver log reads stay O(commits), not O(commits x checkpoint-interval)") {
    val dir = tmpDir("cdf_wide")
    buildWide(dir)
    val before = Versioned.logReads.get()
    val feed = Versioned.changesWithType(spark, dir, 1L, 66L)
    val planned = Versioned.logReads.get() - before
    // 65 in-window commits = 65 entry reads for classification; the two
    // rewrite commits each resolve snapshot file lists / DVs / schemas
    // (bounded by the checkpoint interval, not the window width); the
    // odd checkpoint-entry append resolves its predecessor once. The
    // old per-commit-diff planner burned >2000 reads on this window
    // (65 commits x 2 filesAt walks x up-to-16-entry walk-backs).
    assert(planned < 300, s"planning opened $planned log files")
    // window (1, 66]: appends v2..v64 insert 252 rows; the update pairs
    // the 51 grp-g3 rows; the delete removes the 51 grp-g4 rows
    val g3 = (0 until Appends * 4).count(_ % 5 == 3).toLong
    val g4 = (0 until Appends * 4).count(_ % 5 == 4).toLong
    assert(feed.count() == (Appends - 1) * 4 + 2 * g3 + g4)
  }

  test("wide append-heavy window: plan carries one scan per schema, not one branch per commit") {
    val dir = tmpDir("cdf_plan")
    buildWide(dir)
    val feed = Versioned.changesWithType(spark, dir, 1L, 66L)
    val plan = feed.queryExecution.optimizedPlan
    def leaves(p: LogicalPlan): Int = if (p.children.isEmpty) 1 else p.children.map(leaves).sum
    val unionBranches = plan.collect { case u: Union => u.children.length }.sum
    // ONE add-actions scan serves all 63 append commits; the only
    // other branches come from the TWO rewrite diffs (whose exceptAll
    // pairs the optimizer expands into unions — a constant per rewrite,
    // measured 22 total here). The old per-commit planner put every
    // append through the same diff machinery: 63 × that constant,
    // hundreds of branches. The bound pins constancy in append count.
    assert(unionBranches <= 30, s"union has $unionBranches branches")
    // the rewrite diffs' except/pairing subtrees repeat their scans, so
    // leaf count is a loose bound — what matters is it no longer grows
    // with the 63 append commits (old planner: >130 scan leaves here)
    assert(leaves(plan) <= 40, s"plan has ${leaves(plan)} leaves")
  }

  test("wide window feed matches the per-commit reference semantics") {
    val dir = tmpDir("cdf_sem")
    buildWide(dir)
    val feed = Versioned.changesWithType(spark, dir, 1L, 66L)
      .groupBy("_change_type", "_commit_version").count()
      .as[(String, Long, Long)].collect()
      .map { case (t, v, n) => (t, v) -> n }.toMap
    // reference: every appended row is an insert at its own commit
    // (v1 is OUTSIDE the (1, 66] window)
    val perAppend = (1 until Appends).map(i => ("insert", i + 1L) -> 4L).toMap
    val g3 = (0 until Appends * 4).count(_ % 5 == 3).toLong
    val g4 = (0 until Appends * 4).count(_ % 5 == 4).toLong
    val upd = Map(("update_preimage", 65L) -> g3, ("update_postimage", 65L) -> g3)
    val del = Map(("delete", 66L) -> g4)
    assert(feed == perAppend ++ upd ++ del)
  }

  test("appends interleaved with maintenance: optimize commits contribute nothing and cost nothing") {
    val dir = tmpDir("cdf_maint")
    (0 until 6).foreach { i =>
      Versioned.append(Seq((i, s"v$i")).toDF("id", "s"), dir)
    }
    Versioned.compactSmall(spark, dir, smallBytes = 1L << 30) // v7: row-preserving
    Versioned.append(Seq((100, "late")).toDF("id", "s"), dir)      // v8
    val feed = Versioned.changesWithType(spark, dir, 1L, 8L)
    val got = feed.select("id", "_change_type", "_commit_version")
      .as[(Int, String, Long)].collect().toSet
    val want = (1 until 6).map(i => (i, "insert", i + 1L)).toSet + ((100, "insert", 8L))
    assert(got == want)
    // and the compaction added no plan branch: all appends in one scan
    val unionBranches = feed.queryExecution.optimizedPlan
      .collect { case u: Union => u.children.length }.sum
    assert(unionBranches <= 4, s"union has $unionBranches branches")
  }

  test("a rewrite-heavy window chunk-folds: same feed, bounded plan") {
    val dir = tmpDir("cdf_chunk")
    Versioned.append((1 to 12).map(i => (i, i)).toDF("id", "x"), dir) // v1
    // 6 successive single-row updates: each is a rewrite commit
    (1 to 6).foreach { i =>
      Versioned.updateWhere(spark, dir, col("id") === i,
        Map("x" -> (col("x") + 100)))
    }
    def feedCounts() = Versioned.changesWithType(spark, dir, 1L, 7L)
      .groupBy("_change_type", "_commit_version").count()
      .as[(String, Long, Long)].collect().toSet
    val plain = feedCounts()
    val prev = Versioned.CdfRewriteChunk
    try {
      Versioned.CdfRewriteChunk = 2 // force 3 chunks of 2
      val chunked = feedCounts()
      assert(chunked == plain)
      val branches = Versioned.changesWithType(spark, dir, 1L, 7L)
        .queryExecution.optimizedPlan
        .collect { case u: Union => u.children.length }.sum
      // each chunk collapsed to a materialized leaf: far below the
      // unchunked plan's per-rewrite diff expansion
      assert(branches <= 8, s"union has $branches branches")
    } finally Versioned.CdfRewriteChunk = prev
  }

  test("an all-maintenance window yields an empty feed with the CDF schema") {
    val dir = tmpDir("cdf_silent")
    (0 until 3).foreach { i => Versioned.append(Seq((i, i * 10)).toDF("id", "x"), dir) }
    Versioned.compactSmall(spark, dir, smallBytes = 1L << 30) // v4
    val feed = Versioned.changesWithType(spark, dir, 3L, 4L)
    assert(feed.columns.toSeq == Seq("id", "x", "_change_type", "_commit_version"))
    assert(feed.count() == 0L)
  }
}
