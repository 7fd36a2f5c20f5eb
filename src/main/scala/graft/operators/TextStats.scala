package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Text

/** Corpus-relative text statistics for training-data curation: TF-IDF
  * keyword extraction, rare-token quality signals, and intra-document
  * repetition (the Gopher-style repetition rule). No reference
  * counterpart — these are LLM-pipeline extensions.
  *
  * Determinism across engines: every score is integer counting plus a
  * single IEEE double division (exact and identical in any engine) —
  * deliberately NO logarithms, whose libm implementations differ in the
  * last ulp between JVM and C engines and would poison hash-comparison.
  * tf/df is order-monotone with tf·(N/df) for fixed corpus size N, so
  * top-term selection matches the classic tf·idf ranking.
  */
object TextStats {

  /** (id, tok, tf): within-document term frequencies (whitespace
    * tokens). One explode + one hash aggregate.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("tf"))

  /** (tok, df): document frequencies, derived from `termFrequencies`
    * (its rows are already (doc, term)-distinct).
    */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy("tok").agg(count(lit(1)).as("df"))

  /** The most distinctive term per document: argmax of tf/df, ties to
    * the lexicographically smallest term. Join on the token is a plain
    * hash-shuffle (vocabulary-sized, not corpus-sized, after the tf
    * aggregate).
    */
  def topTermPerDoc(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val scored = tf.join(docFrequencies(tf), Seq("tok"))
      .withColumn("score", col("tf").cast("double") / col("df"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id").as(idCol), col("tok").as("top_term"),
        col("tf"), col("df"), col("score"))
  }

  /** Per-document rarity profile: distinct-token count, number of
    * corpus-unique tokens (df = 1), and the average document frequency
    * of the doc's tokens — a commonness score (low = unusual content).
    */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    tf.join(docFrequencies(tf), Seq("tok"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(when(col("df") === 1, 1).otherwise(0)).as("n_rare"),
        (sum(col("df")).cast("double") / count(lit(1))).as("avg_df"))
  }

  /** Intra-document 2-gram repetition in [0, 1): `1 − distinct/total`
    * over word bigrams (0 for docs shorter than 2 tokens). High values
    * flag boilerplate/spam — the classic repetition quality rule.
    */
  def repetitionScore(c: Column): Column = {
    val nTok = size(Text.tokens(c))
    val total = (nTok - 1).cast("double")
    val distinctBigrams = size(Text.shingles(c, 2)).cast("double")
    when(nTok >= 2, lit(1.0) - distinctBigrams / total).otherwise(lit(0.0))
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens by total
    * occurrence count, ties to the lexicographically smaller token —
    * the counting pass a frequency-cutoff tokenizer-training pipeline
    * starts from. One explode + map-side-combinable count + a top-k
    * sort bounded to k rows per partition (TakeOrderedAndProject).
    */
  def vocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)

  /** Joiner inside merged BPE tokens (US control char): never appears
    * between tokens (that's the double-space joiner), so a merged
    * token's identity survives later rounds unambiguously.
    */
  private[graft] val MergeSep = "\u001f"

  /** N-round BPE merge training over whitespace tokens — the
    * tokenizer-training fixpoint a real corpus pipeline runs, extending
    * the one-step `x_bpe_pairs` primitive: each round counts adjacent
    * token pairs corpus-wide, picks the most frequent (ties to the
    * lexicographically smaller pair id), and applies the merge greedily
    * left-to-right to every document. Returns the learned merge table
    * (step, pair, n) — which IS the trained tokenizer.
    *
    * Representation: each document is ONE string with every token
    * wrapped in its own pair of spaces (`' a  b  c '` — double-space
    * joiner, single-space ends), so the greedy merge scan is a single
    * builtin `replace`: the pattern `' a  b '` consumes one space from
    * each side, leaving the neighbours' own spaces intact, which makes
    * back-to-back merge sites (`a b a b`) all match in one
    * left-to-right non-overlapping pass — exactly the classic BPE merge
    * scan, and exactly reproducible by DuckDB's `replace` for the
    * oracle's unrolled replay.
    *
    * Scale shape: per round ONE map-side projection (the replace) and
    * one map-side-combinable pair count; only the single winning pair
    * row crosses to the driver per round (the bounded-fixpoint
    * discipline of Rank.pageRank). The working corpus is re-persisted
    * every round (spill-to-disk) so round k never recomputes rounds
    * 1..k−1's replaces — at 100 TB this is the same
    * materialize-the-working-set choice an iterative trainer must make
    * whatever the engine.
    */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    var seq = docs.select(
      concat(lit(" "), array_join(Text.tokens(col(textCol)), "  "), lit(" "))
        .as("seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the parent round's corpus stays persisted until the CHILD round is
    // materialized — by the pair count itself, not a dedicated count()
    // pass: round r's aggregation computes round r−1's replace from the
    // parent's cached blocks and fills the child's cache as a side
    // effect, so each round costs ONE corpus pass instead of two (and
    // the final round's replace, which no round consumes, is never
    // computed at all)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var r = 1
    var dry = false // a corpus can run out of pairs before `rounds`
    while (r <= rounds && !dry) {
      val top = seq
        .select(split(trim(col("seq")), "  ").as("w")) // literal two spaces
        .select(explode(expr(
          "transform(slice(w, 1, size(w) - 1), " +
            "(x, i) -> concat(x, ' ', element_at(w, i + 2)))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .collect()
      prev.foreach(_.unpersist()) // child cache is now filled
      prev = Some(seq)
      if (top.isEmpty) dry = true
      else {
        val (pair, n) = (top(0).getString(0), top(0).getLong(1))
        merges += ((r.toLong, pair, n))
        val Array(a, b) = pair.split(" ", 2)
        seq = seq.select(
          replace(col("seq"), lit(s" $a  $b "), lit(s" $a$MergeSep$b "))
            .as("seq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      r += 1
    }
    seq.unpersist()
    prev.foreach(_.unpersist())
    merges.toSeq.toDF("step", "pair", "n")
  }

  /** Tokenizes every document with a TRAINED merge table (the
    * inference half of [[bpeTrain]]): applies the ordered merges to the
    * spaced-string form, then splits back into tokens — adds a
    * `bpe_tokens` array column. ONE codegen'd map-side projection
    * chaining one builtin `replace` per merge, zero shuffle, merge
    * table as plan literals (tokenizer-sized — tens of KB — never
    * broadcast-worthy; a production 32k-merge table would compile the
    * chain into a single expression to stay under codegen method
    * limits, same plan shape). Later-round pairs may themselves contain
    * [[MergeSep]] — the split below keeps a merged token atomic, which
    * is exactly why the joiner is a char that never appears in input
    * tokens.
    */
  def bpeEncode(docs: DataFrame, textCol: String, merges: Seq[String]): DataFrame = {
    val seq0 = concat(lit(" "), array_join(Text.tokens(col(textCol)), "  "), lit(" "))
    val merged = merges.foldLeft(seq0) { (acc, pair) =>
      val Array(a, b) = pair.split(" ", 2)
      replace(acc, lit(s" $a  $b "), lit(s" $a$MergeSep$b "))
    }
    // an empty/all-whitespace document has ZERO tokens, but split("")
    // yields [""] in every engine — special-case it to the empty array
    docs.withColumn("bpe_tokens",
      when(trim(merged) === "", array().cast("array<string>"))
        .otherwise(split(trim(merged), "  ", -1)))
  }

  /** Exact discrete quantiles of the whitespace-token count per group:
    * the value at rank `ceil(q·n / 100)` under a (length, id) total
    * order. Deliberately NOT approx_percentile — its sketch is
    * merge-order-dependent and engine-specific; exact selection with
    * integer rank arithmetic picks the identical element in any engine.
    * One shuffle on the group key (window + aggregate share it).
    */
  def lengthQuantiles(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percentiles.forall(p => p >= 1 && p <= 100), s"bad percentiles: $percentiles")
    val w = Window.partitionBy(groupCol).orderBy(col("__len"), col(idCol))
    val ranked = docs
      .select(col(groupCol), col(idCol),
        Text.tokenCount(col(textCol)).cast("long").as("__len"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = percentiles.map { p =>
      // rank target via integer ceil (`div`, not `/` — Column `/` is
      // DOUBLE division): no FP anywhere in the selection
      max(when(col("__rn") <= expr(s"(__n * $p + 99) div 100"), col("__len"))).as(s"p$p")
    }
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
  }
}
