package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level language-model scoring for training-data curation —
  * the CCNet-style quality gate (train a small LM on a trusted slice,
  * score every crawled document by how surprised the model is) and the
  * DSIR importance weight (Xie et al. 2023: hashed-feature
  * log-likelihood ratio between a target and the raw distribution).
  * Reference analog: the lakehouse's review/quality scoring notebooks
  * rank rows by heuristic scores; these operators are the corpus-scale
  * versions a 100 TB pretraining pipeline runs before sampling.
  *
  * Determinism (the x_pagerank / fixed-point k-means discipline): no
  * transcendental floats anywhere. log2 is computed EXACTLY as
  * `length(bin(x)) - 1` — the bit length of a positive int64 is its
  * floor(log2) + 1 in Spark and DuckDB alike — so every score is a
  * whole-bit integer surprisal, replayable bit-for-bit in any SQL
  * engine regardless of partition count or merge order. A float
  * `ln()` could never hash-match across engines (libm vs JVM last-ulp
  * drift), and a whole-bit surprisal is exactly the resolution a
  * keep/drop curation gate uses.
  *
  * Scale shape (100 TB):
  *   - token/bigram extraction is a per-row projection (zero shuffle);
  *   - LM counts are one map-side-combinable groupBy each, keyed on
  *     the bigram / prefix token — bounded by vocabulary, not corpus;
  *   - the bigram table is pruned to top-K by count (TakeOrderedAndProject
  *     — per-partition partial top-K, K rows to the driver), mirroring
  *     how real n-gram LMs are pruned for serving, so the scoring join's
  *     build side is O(K) and broadcastable at any corpus size;
  *   - scoring is explode → join → one aggregation per doc. No collect,
  *     no driver loop, no O(n²) pair set.
  */
object LangModel {

  /** Reciprocal-probability scale: milli-units keep the `bin()` argument
    * ≥ ProbScale (p ≤ 1 always) while (count + vocab) · ProbScale stays
    * far below 2^63 for any plausible corpus (~10^15 training tokens).
    */
  val ProbScale = 1000L

  /** DSIR probability quantization: each hashed-feature probability is
    * clamped below 2^-16 before its floor(log2) is taken. 2^16 · count
    * must stay under 2^63 → corpora to ~1.4e14 target tokens, past a
    * 100 TB text corpus (~2e13 whitespace tokens).
    */
  val DsirScale = 65536L

  /** Lowercased whitespace tokens (mirrors Text.tokens + lower — the
    * tokenization the DuckDB oracles replay via string_split_regex).
    */
  private def words(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Adjacent-token bigrams "w_i w_{i+1}" of a words array — a zip of
    * the array against itself shifted by one; per-row, zero shuffle.
    */
  private def bigrams(w: Column): Column =
    zip_with(
      slice(w, lit(1), size(w) - 1),
      slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** floor(log2(x)) + 1 for a positive long column — exact in both
    * engines as the length of the minimal binary representation.
    */
  private def bitLength(x: Column): Column = length(bin(x)).cast("long")

  /** Bigram-LM surprisal per document (CCNet-style perplexity filter).
    *
    * Trains an add-one-smoothed bigram model on the `train` slice
    * (p(w2|w1) = (c12+1)/(c1+V)), prunes it to the `topK` most frequent
    * bigrams (ties broken by bigram text), then scores EVERY document
    * with >= 2 tokens:
    *
    *   bits(w1 w2) = bitLength( ((c1 + V) * ProbScale) div (c12 + 1) )
    *
    * i.e. the whole-bit surprisal of the smoothed bigram probability
    * (plus the constant log2(ProbScale) ≈ 10 offset, identical for all
    * rows). Unseen prefixes contribute c1 = 0; pruned/unseen bigrams
    * contribute c12 = 0 — the standard "everything unseen backs off to
    * the Laplace floor" behavior.
    *
    * Output: doc_id, n_bigrams, surprisal_bits (total), and
    * milli_bits_per_bigram — the length-normalized score a curation
    * gate thresholds on (low = fluent under the trained LM).
    */
  def surprisalBits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: Column,
      topK: Int): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), train.as("is_train"),
        words(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)

    // The WHOLE trained model derives from one aggregation: the bigram
    // count table (vocabulary-bounded, not corpus-bounded), computed in
    // a single scan+explode pass over the train slice and checkpointed.
    // Prefix counts and vocabulary then come from the TABLE, not from
    // re-tokenizing the corpus: every token of a >= 2-token doc appears
    // in some bigram (position i is the first component of bigram i for
    // i < n), so prefix-count(t) = Σ_{w2} count(t, w2) exactly, and the
    // vocabulary is the distinct token set over bigram components. This
    // collapses the train side from three corpus passes to one — at
    // 100 TB the difference between scanning the trusted slice once and
    // three times (and the fix for the GC thrash three concurrent
    // string-explode subtrees caused at sf1 under a default heap).
    val lm = tok.filter(col("is_train"))
      .select(explode(bigrams(col("w"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .localCheckpoint()

    // serving LM: top-K by (count desc, bigram asc). sort+limit plans
    // as TakeOrderedAndProject — each partition keeps K candidates, the
    // driver merges K rows total.
    val kept = lm.sort(col("c12").desc, col("bg").asc).limit(topK)

    // prefix counts: occurrences of each token in positions 1..n-1
    val prefix = lm
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .groupBy("w1").agg(sum(col("c12")).as("c1"))

    // vocabulary size: one scalar, joined in as a 1-row broadcast
    val vocab = lm
      .select(explode(array(
        split(col("bg"), " ").getItem(0),
        split(col("bg"), " ").getItem(1))).as("tkn"))
      .agg(countDistinct(col("tkn")).as("v"))

    tok
      .select(col("doc_id"), explode(bigrams(col("w"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(kept, Seq("bg"), "left")
      .join(prefix, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(
        col("doc_id"),
        bitLength(expr(
          s"((coalesce(c1, CAST(0 AS BIGINT)) + v) * $ProbScale) " +
            "div (coalesce(c12, CAST(0 AS BIGINT)) + 1)")).as("bits"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("surprisal_bits"))
      .withColumn(
        "milli_bits_per_bigram",
        expr("(surprisal_bits * 1000) div n_bigrams"))
  }

  /** DSIR importance weights (hashed bag-of-unigrams, whole-bit logs).
    *
    * Every token hashes into one of `buckets` features (portable
    * polynomial hash mod buckets). Two smoothed feature distributions
    * are estimated — p over the `target` slice, q over the whole
    * corpus — and each document is weighted by its log-likelihood
    * ratio, quantized per token to whole bits:
    *
    *   lr(f) = qlog2(ct+1, Nt+B) - qlog2(cr+1, Nr+B)
    *   qlog2(num, den) = bitLength(greatest(1, (num * DsirScale) div den))
    *
    * weight_bits(doc) = Σ_tokens lr(feature(token)) — positive means
    * the document looks more like the target slice than the raw corpus
    * (sample it up), negative means raw-typical (sample it down).
    * The feature-count tables are `buckets` rows each — broadcast at
    * any corpus size — and the two scalars (Nt, Nr) ride along in the
    * same 1-row frame, so scoring is a per-token map + one aggregation.
    */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      target: Column,
      buckets: Int): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), target.as("is_target"),
        explode(words(col(textCol))).as("tkn"))
      .filter(length(col("tkn")) > 0)
      .withColumn("f", Text.polyHash(col("tkn")) % buckets)

    // per-feature counts over target slice and raw corpus: B-bounded
    val counts = tok
      .groupBy("f")
      .agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))

    // the two normalizers as one broadcastable 1-row frame
    val totals = tok.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"))

    val b = buckets.toLong
    tok
      .join(counts, Seq("f"))
      .crossJoin(broadcast(totals))
      .select(
        col("doc_id"),
        (bitLength(greatest(lit(1L), expr(s"((ct + 1) * $DsirScale) div (nt + $b)")))
          - bitLength(greatest(lit(1L), expr(s"((cr + 1) * $DsirScale) div (nr + $b)"))))
          .as("lr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("weight_bits"))
  }

  /** Distributed BATCH perceptron over hashed bag-of-unigram counts —
    * the model-based quality-classifier family (DCLM / FineWeb-edu
    * train a fasttext-style classifier and keep what it scores high;
    * this is that family's linear core, trained entirely inside the
    * engine). Integer end to end:
    *
    *   x[doc, f]  = count of tokens hashing to feature f (B buckets)
    *   y[doc]     = +1 if `positive`, else -1
    *   w_1[f]     = Σ_docs y·x           (round 1: w_0 = 0, every doc
    *                                      has margin 0 and updates)
    *   m_t[doc]   = Σ_f w_t[f]·x[doc,f]
    *   w_{t+1}[f] = w_t[f] + Σ_{y·m_t ≤ 0} y·x[doc,f]
    *
    * The BATCH update (sum over all misclassified docs at once, not
    * the classic sequential walk) makes the trainer order-independent:
    * integer sums are associative/commutative, so the learned weights
    * are a pure function of the data — replayable bit-for-bit as
    * `rounds` unrolled SQL stages, the x_pagerank discipline.
    *
    * Scale shape: the weight vector is B rows (broadcast at any corpus
    * size); each round is one broadcast join + per-doc sum (margin) and
    * one map-side-combinable per-feature sum (update). Feature rows are
    * checkpointed once and reused every round. Overflow: |w| ≤ rounds ·
    * total-token-count and margins ≤ |w| · doc tokens — at a 2e13-token
    * corpus and 3 rounds, margins stay under ~2^60 for million-token
    * documents; corpora past that should scale counts down before
    * training (as any integer-weight learner must).
    *
    * Returns per-doc (doc_id, label, margin, pred) under the
    * final-round weights: the scored corpus a curation gate thresholds.
    */
  def perceptronScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      positive: Column,
      buckets: Int,
      rounds: Int): DataFrame = {
    val ft = features(docs, idCol, textCol, positive, buckets)
    ft.join(broadcast(trainOn(ft, rounds)), Seq("f"))
      .groupBy("doc_id", "y").agg(sum(col("w") * col("x")).as("margin"))
      .select(
        col("doc_id"),
        col("y").as("label"),
        col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
  }

  /** The trained weight vector alone — (f, w), `buckets` rows: the
    * model artifact an ONLINE filter broadcasts against a stream
    * (st12_stream_quality_filter) while training stays a batch job.
    */
  def perceptronWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      positive: Column,
      buckets: Int,
      rounds: Int): DataFrame =
    trainOn(features(docs, idCol, textCol, positive, buckets), rounds)

  /** Hashed labeled unigram counts (doc_id, y, f, x) — checkpointed:
    * the trainer reads them once per round on both the margin and the
    * update side.
    */
  private def features(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      positive: Column,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        when(positive, 1L).otherwise(-1L).as("y"),
        explode(words(col(textCol))).as("tkn"))
      .filter(length(col("tkn")) > 0)
      .withColumn("f", Text.polyHash(col("tkn")) % buckets)
      .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("x"))
      .localCheckpoint()

  private def trainOn(ft: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // round 1: w_0 = 0 ⇒ every margin is 0 ⇒ every doc updates
    var w = ft.groupBy("f").agg(sum(col("y") * col("x")).as("w"))
      .localCheckpoint() // B rows; truncates per-round lineage
    for (_ <- 2 to rounds) {
      val miss = ft.join(broadcast(w), Seq("f"))
        .groupBy("doc_id", "y").agg(sum(col("w") * col("x")).as("m"))
        .filter(col("y") * col("m") <= 0)
        .select("doc_id")
      val upd = ft.join(miss, Seq("doc_id"))
        .groupBy("f").agg(sum(col("y") * col("x")).as("u"))
      w = w.join(upd, Seq("f"), "left")
        .select(col("f"), (col("w") + coalesce(col("u"), lit(0L))).as("w"))
        .localCheckpoint()
    }
    w
  }
}
