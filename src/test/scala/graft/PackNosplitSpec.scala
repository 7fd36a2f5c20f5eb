package graft

import org.apache.spark.sql.functions._

/** No-split sequence packing (queries/Extensions.packNosplit): docs
  * never cross a context-window boundary, greedy per-shard fold.
  */
class PackNosplitSpec extends SparkSpec {

  // run the query against real sf0.001 docs — the fold is exercised
  // through the public QueryDef exactly as the driver runs it
  private def run() =
    graft.queries.Extensions.packNosplit(spark, "/root/testdata/sf0.001")

  test("no document crosses a window boundary; bins fill greedily in doc order") {
    val rows = run().collect()
    assert(rows.nonEmpty)
    val budget = 256L
    // invariant 1: every doc fits inside its bin
    assert(rows.forall(r => r.getLong(4) + r.getLong(2) <= budget),
      "a doc crosses its window boundary")
    // invariant 2: n_eff = min(n_tok, budget)
    assert(rows.forall(r => r.getLong(2) == math.min(r.getLong(1), budget)))
    // invariant 3: within a bin, offsets are the running sum of n_eff in
    // doc_id order (greedy, no gaps)
    rows.groupBy(_.getLong(3)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      var fill = 0L
      sorted.foreach { r =>
        assert(r.getLong(4) == fill, s"gap in bin ${r.getLong(3)} at doc ${r.getLong(0)}")
        fill += r.getLong(2)
      }
    }
    // invariant 4: greedy = a doc only starts a new bin when it would
    // not fit in the previous doc's bin (check per shard walk)
    rows.groupBy(r => r.getLong(0) / 64L).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getLong(3) != b.getLong(3) =>
          assert(a.getLong(4) + a.getLong(2) + b.getLong(2) > budget,
            s"doc ${b.getLong(0)} opened a new bin though it fit")
        case _ =>
      }
    }
    // invariant 5: bin ids don't collide across shards
    val binToShard = rows.groupBy(_.getLong(3)).map { case (bin, rs) =>
      bin -> rs.map(r => r.getLong(0) / 64L).distinct
    }
    assert(binToShard.values.forall(_.length == 1))
  }

  test("deterministic under input partitioning and exact vs a scala reference fold") {
    val rows = run().collect().map(_.toSeq)
    val again = run().collect().map(_.toSeq)
    assert(rows.toSeq == again.toSeq)
    // scala reference: same greedy walk computed driver-side
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val budget = 256L
    val expect = docs.groupBy(_._1 / 64L).toSeq.flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_._1).map { case (id, n) =>
        val nEff = math.min(n, budget)
        val (b, off) =
          if (fill + nEff <= budget) (bin, fill)
          else { bin += 1; (bin, 0L) }
        fill = off + nEff
        Seq(id, n, nEff, shard * 64L + b, off)
      }
    }.sortBy(_.head.asInstanceOf[Long])
    assert(rows.toSeq == expect)
  }
}
