package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Corpus LM scoring: the CCNet-style bigram surprisal gate and DSIR
  * hashed importance weights (operators/LangModel.scala).
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the cat sat on the mat", "en"),
    (3L, "the dog sat on the mat", "en"),
    (4L, "zqx vbn plm okn ijb uhb", "xx"), // junk: every bigram unseen
    (5L, "the cat sat", "xx"),             // target-like non-target doc
    (6L, "one", "xx")                       // single token: no bigrams
  ).toDF("doc_id", "text", "lang")

  test("surprisalBits: trained-slice docs score low, junk scores high, exact integer bits") {
    val out = LangModel
      .surprisalBits(docs, "doc_id", "text", col("lang") === "en", topK = 1000)
      .orderBy("doc_id")
      .collect()

    // doc 6 has one token -> no bigrams -> absent
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))

    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // identical docs score identically
    assert(byId(1L) == byId(2L))
    // hand-check doc 1: train = docs 1-3, V = 7 distinct tokens
    //   ("the","cat","sat","on","mat","dog" + none else -> 6? count:
    //   the,cat,sat,on,mat,dog = 6); prefix counts over positions 1..n-1.
    // Rather than re-derive each count here, pin the invariant the gate
    // uses: junk doc 4 must score strictly more bits per bigram than any
    // trained-slice doc, and the target-like doc 5 must sit at or below
    // the junk doc.
    val junk = byId(4L)._3
    assert(Seq(1L, 2L, 3L).forall(id => byId(id)._3 < junk),
      s"junk must out-surprise fluent docs: $byId")
    assert(byId(5L)._3 < junk)
    // n_bigrams = token count - 1
    assert(byId(1L)._1 == 5L && byId(4L)._1 == 5L && byId(5L)._1 == 2L)
    // bits are exact integers >= log2(ProbScale): every bigram's
    // reciprocal probability is > ProbScale, so each contributes >= 10
    assert(out.forall(r => r.getLong(2) >= 10L * r.getLong(1)))
    // deterministic: partition count cannot move a single bit
    val rep = LangModel
      .surprisalBits(docs.repartition(7), "doc_id", "text",
        col("lang") === "en", topK = 1000)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == rep.map(_.toSeq).toSeq)
  }

  test("surprisalBits: topK prune backs pruned bigrams off to the Laplace floor") {
    // topK = 1 keeps only the most frequent bigram ("the mat" x3? count:
    // 'the cat' x2, 'cat sat' x2, 'sat on' x2, 'on the' x2(?), 'the mat' x3?
    // doc1: the cat|cat sat|sat on|on the|the mat; doc2 same; doc3:
    // the dog|dog sat|sat on|on the|the mat => 'sat on' 3, 'on the' 3,
    // 'the mat' 3, tie broken by text: 'on the' < 'sat on' < 'the mat').
    val pruned = LangModel
      .surprisalBits(docs, "doc_id", "text", col("lang") === "en", topK = 1)
      .orderBy("doc_id").collect()
    val full = LangModel
      .surprisalBits(docs, "doc_id", "text", col("lang") === "en", topK = 1000)
      .orderBy("doc_id").collect()
    // pruning can only RAISE surprisal (c12 backs off to 0)
    val p = pruned.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val f = full.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f.keySet == p.keySet)
    assert(f.keySet.forall(id => p(id) >= f(id)))
    // and the junk doc (nothing kept either way) is unchanged
    assert(p(4L) == f(4L))
  }

  test("dsirWeights: target-like docs weigh positive vs junk, exact under repartition") {
    val out = LangModel
      .dsirWeights(docs, "doc_id", "text", col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val w = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 6L && n(6L) == 1L)
    // identical docs weigh identically
    assert(w(1L) == w(2L))
    // the all-junk doc must weigh strictly below every target doc
    assert(Seq(1L, 2L, 3L, 5L).forall(id => w(id) > w(4L)), s"weights: $w")
    // per-token quantized log-ratio is bounded by the scale: |lr| <= 17
    // bits per token (DsirScale = 2^16, one spare bit for the clamp)
    assert(out.forall(r => math.abs(r.getLong(2)) <= 17L * r.getLong(1)))
    val rep = LangModel
      .dsirWeights(docs.repartition(5), "doc_id", "text",
        col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == rep.map(_.toSeq).toSeq)
  }

  test("perceptronScores: separates disjoint vocabularies, exact under repartition") {
    // two disjoint vocabularies -> linearly separable in hash space
    // (up to bucket collisions; 512 buckets vs ~50 tokens keeps those rare)
    val pos = (0 until 20).map(i => (i.toLong, s"good fine great solid ample g$i", "en"))
    val neg = (20 until 40).map(i => (i.toLong, s"junkzz spamzz noisezz b$i b$i", "xx"))
    val d = (pos ++ neg).toDF("doc_id", "text", "lang")
    val out = LangModel
      .perceptronScores(d, "doc_id", "text", col("lang") === "en",
        buckets = 512, rounds = 5)
      .orderBy("doc_id").collect()
    assert(out.length == 40)
    // labels round-trip
    assert(out.forall(r => r.getLong(1) == (if (r.getLong(0) < 20) 1L else -1L)))
    // a separable problem classifies nearly everything after 5 rounds
    val acc = out.count(r => r.getLong(3) == r.getLong(1))
    assert(acc >= 36, s"separable corpus should classify: $acc/40")
    // pred is the sign of margin (0 -> -1)
    assert(out.forall(r =>
      r.getLong(3) == (if (r.getLong(2) > 0) 1L else -1L)))
    // batch updates are order-independent: bit-identical under repartition
    val rep = LangModel
      .perceptronScores(d.repartition(7), "doc_id", "text",
        col("lang") === "en", buckets = 512, rounds = 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == rep.map(_.toSeq).toSeq)
    // rounds = 1 is the pure w1 = sum(y*x) scorer and must also run
    val r1 = LangModel
      .perceptronScores(d, "doc_id", "text", col("lang") === "en",
        buckets = 512, rounds = 1)
      .orderBy("doc_id").collect()
    assert(r1.length == 40)
  }

  test("clusterBalance query: exhaustive over clusters, min cluster keeps everything") {
    val out = graft.queries.Extensions
      .clusterBalance(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    // every vector lands in exactly one cluster
    assert(out.map(_.getLong(1)).sum == total)
    // rates are valid ppm, the smallest cluster keeps all its members
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 1000000L))
    val minRow = out.minBy(_.getLong(1))
    assert(minRow.getLong(2) == 1000000L && minRow.getLong(3) == minRow.getLong(1))
    // kept never exceeds cluster size
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)))
  }
}
