package graft

import org.apache.spark.sql.functions._

import graft.operators.{Splits, TextStats}

/** Corpus-preparation operators: deterministic splits, vocabulary
  * counting, exact quantile selection.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is a deterministic, exhaustive, disjoint partition") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Splits.assign(docs, "doc_id").collect()
    assert(a.length == 1000)
    assert(a.forall(r => Set("train", "val", "test")(r.getString(2))))
    // deterministic: identical on re-evaluation
    val b = Splits.assign(docs, "doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // stable under corpus growth: the first 1000 keep their splits
    val grown = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val g = Splits.assign(grown, "doc_id").filter(col("doc_id") < 1000).collect()
    assert(a.map(_.toSeq).toSet == g.map(_.toSeq).toSet)
    // uniform-ish at n=1000: train within [70%, 90%]
    val nTrain = a.count(_.getString(2) == "train")
    assert(nTrain > 700 && nTrain < 900, s"train fraction off: $nTrain/1000")
    // a different salt reshuffles some assignments
    val salted = Splits.assign(docs, "doc_id", salt = "other").collect()
    assert(salted.map(_.toSeq).toSeq != a.map(_.toSeq).toSeq)
  }

  test("bpeTrain merges greedily left-to-right, rewriting the corpus between rounds") {
    // round 1: 'a b' wins (3 occurrences; 'b a' has 2 — the back-to-back
    // 'a b a b' doc must count BOTH its 'a b' sites and merge both);
    // 'x x x' pins non-overlap: greedy yields [x·x, x], ONE pair consumed
    val docs = Seq(
      "a b a b", // both sites merge in one pass
      "a b c",   // one site
      "x x x"    // overlap case: only the first pair merges
    ).toDF("text")
    val merges = TextStats.bpeTrain(docs, "text", 3)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val M = TextStats.MergeSep
    assert(merges(0) == ((1L, "a b", 3L)))
    // post-round-1 corpus: [a·b a·b], [a·b c], [x x x] — the surviving
    // pair set is {a·b a·b: 1, a·b c: 1, x x: 2}, so 'x x' wins round 2
    assert(merges(1) == ((2L, "x x", 2L)))
    // post-round-2: [a·b a·b], [a·b c], [x·x x] — all pairs now unique;
    // lexicographic tiebreak picks the smallest pair id
    assert(merges(2)._1 == 3L && merges(2)._3 == 1L)
    assert(merges(2)._2 == Seq(s"a${M}b a${M}b", s"a${M}b c", s"x${M}x x").min)

    // a corpus that runs dry stops early instead of looping: 'a b'
    // merges once, then no adjacent pair remains anywhere
    val dry = TextStats.bpeTrain(
      Seq("only", "a b", "").toDF("text"), "text", 5).collect()
    assert(dry.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a b")))
  }

  test("bpeEncode applies trained merges in order, keeping merged tokens atomic") {
    val M = TextStats.MergeSep
    // merges: round 1 'a b', round 2 'a·b c' — the second pair contains
    // the first round's joiner, so encode must treat it atomically
    val merges = Seq("a b", s"a${M}b c")
    val docs = Seq(
      ("a b c d", Seq(s"a${M}b${M}c", "d")), // both merges fire, chained
      ("a b a b", Seq(s"a${M}b", s"a${M}b")), // back-to-back sites both merge
      ("c a d", Seq("c", "a", "d")),         // no site: untouched tokens
      ("  ", Seq.empty[String])               // whitespace-only → zero tokens
    ).toDF("text", "expect")
    val enc = TextStats.bpeEncode(docs, "text", merges)
      .select("text", "bpe_tokens", "expect")
      .as[(String, Seq[String], Seq[String])].collect()
    enc.foreach { case (text, got, expect) =>
      assert(got == expect, s"encode of '$text'")
    }
  }

  test("vocabulary counts total occurrences with (n desc, tok asc) order") {
    val docs = Seq((1L, "a b b c"), (2L, "b c c a")).toDF("doc_id", "text")
    val v = TextStats.vocabulary(docs, "text", 2).as[(String, Long)].collect().toSeq
    assert(v == Seq(("b", 3L), ("c", 3L))) // tie 3-3 broken by token asc
  }

  test("lengthQuantiles selects exact ranked elements per group") {
    // group g: lengths 1..10  -> p50 = 5th smallest = 5, p90 = 9, p99 = 10
    // group h: single doc of length 7 -> all quantiles = 7
    val docs = ((1 to 10).map(i => (i.toLong, ("w " * i).trim, "g")) :+
      ((99L, ("w " * 7).trim, "h"))).toDF("doc_id", "text", "source")
    val q = TextStats.lengthQuantiles(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
    assert(q.length == 2)
    val g = q(0)
    assert(g.getString(0) == "g" && g.getLong(1) == 10 &&
      g.getLong(2) == 5 && g.getLong(3) == 9 && g.getLong(4) == 10)
    val h = q(1)
    assert(h.getString(0) == "h" && h.getLong(1) == 1 &&
      h.getLong(2) == 7 && h.getLong(3) == 7 && h.getLong(4) == 7)
  }

  private val sf = "/root/testdata/sf0.001"

  test("x_chunk tiles every document exactly: full interior chunks, last chunk ends at n") {
    import graft.queries.{Extensions, Tables}
    import org.apache.spark.sql.expressions.Window
    val size = 32; val stride = 24
    val chunks = Extensions.chunk(spark, sf)
      .withColumn("max_id", max(col("chunk_id")).over(Window.partitionBy("doc_id")))
    val n = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
    val bad = chunks.join(n, "doc_id").filter(
      (col("chunk_id") =!= col("max_id") && col("chunk_tok") =!= size) ||
        (col("chunk_id") === col("max_id") &&
          ((col("chunk_id") - 1) * stride + col("chunk_tok")) =!= col("n")) ||
        col("chunk_tok") < 1 || col("chunk_tok") > size)
      .count()
    assert(bad == 0)
  }

  test("x_pack offsets are the exact global prefix sum, bins well-formed") {
    import graft.queries.Extensions
    val rows = Extensions.pack(spark, sf)
      .select("doc_id", "n_tok", "tok_offset", "first_bin", "last_bin", "bins_spanned")
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty && rows.head.getLong(2) == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
          s"offset gap at doc ${b.getLong(0)}")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1 && r.getLong(5) >= 1)
    }
  }

  test("temperature sampling keeps the smallest domain whole, downsamples sqrt-wise") {
    // domains: tiny (100), big (6400 = 64x) -> rates 1e6 and 1e6/8
    val docs = ((0L until 100L).map(i => (i, "tiny")) ++
      (1000L until 7400L).map(i => (i, "big"))).toDF("doc_id", "source")
    val out = Splits.temperatureSample(docs, "source", "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nTiny, rTiny, kTiny) = out("tiny")
    assert(nTiny == 100L && rTiny == 1000000L && kTiny == 100L,
      s"smallest domain must keep everything: $out")
    val (nBig, rBig, kBig) = out("big")
    assert(nBig == 6400L && rBig == 125000L, s"64x domain rate must be 1/8: $out")
    // kept fraction within sampling noise of the rate (binomial, n=6400)
    assert(math.abs(kBig - 800L) < 150L, s"kept count off the 1/8 rate: $kBig")
    // deterministic on re-evaluation
    val again = Splits.temperatureSample(docs, "source", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("big") == kBig && again("tiny") == kTiny)
  }

  test("shuffleOrder is a deterministic total permutation, salt-independent") {
    val docs = (0L until 500L).map(i => (i, i)).toDF("doc_id", "v")
    val a = Splits.shuffleOrder(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.map(_._1).sorted.toSeq == (1L to 500L), "positions must be 1..n")
    assert(a.map(_._2).toSet.size == 500, "every doc exactly once")
    // sharded two-pass rank == the naive global rank by (h, id)
    val naive = Splits.shuffleOrder(docs, "doc_id").orderBy("h", "doc_id")
      .collect().map(_.getLong(0))
    assert(naive.toSeq == (1L to 500L), "rank must follow (h, id) order")
    val b = Splits.shuffleOrder(docs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "deterministic")
    val other = Splits.shuffleOrder(docs, "doc_id", epoch = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(other.sortBy(_._1).map(_._2).toSeq != a.sortBy(_._1).map(_._2).toSeq,
      "a new epoch must yield a different permutation")
  }
}
