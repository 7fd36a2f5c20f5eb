package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Text
import graft.operators.{Curation, HyperplaneLsh, LangModel, Multimodal, Quantize, Similarity, Sketches, TextDedup, TextStats}

/** Training-data pipeline extension queries (BASELINE.json north star):
  * dedup (exact / n-gram Jaccard / MinHash LSH / SimHash / embedding),
  * similarity search (brute-force + IVF), text analysis (lang-id,
  * quality, token counts, fingerprints), multimodal plumbing.
  *
  * Oracle strategy: the Spark side runs the *scalable* formulation
  * (inverted-index joins, LSH banding, broadcast top-k); the DuckDB SQL
  * runs the naive exact formulation (O(n²) cross joins, list folds).
  * Both must produce identical rows — that is the point: the distributed
  * plan is checked against the textbook definition. All float arithmetic
  * is double, folded left-to-right in both engines (verified
  * bit-identical), so thresholds and rankings cannot diverge.
  */
object Extensions {
  import Tables.t

  private val ShingleK = 3

  // ---- shared DuckDB fragments (mirror graft.functions.Text exactly) --

  private def sqlWords(e: String) = s"string_split_regex(trim($e), '\\s+')"

  private[queries] def sqlPolyHash(e: String, base: Long = Text.HashBase) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(acc,x) -> (acc*$base + x) % ${Text.HashMod})"

  /** Word 3-gram shingles over a words-list alias `w`. */
  private val sqlShingles =
    "CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1), " +
      "i -> w[i]||' '||w[i+1]||' '||w[i+2])) " +
      "ELSE [array_to_string(w, ' ')] END"

  private def sqlDot(x: String, y: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($x)+1), i -> $x[i]*$y[i])), (acc,v) -> acc+v)"

  /** O(n²) exact Jaccard pair CTEs (terminating in `jp`) with the
    * size-ratio prefilter (J ≥ t ⇒ |A|/|B| and |B|/|A| ≥ t — pure
    * speedup, never drops a qualifying pair).
    */
  private def jaccardPairsCte(threshold: Double, src: String = "documents"): String =
    s"""s AS (SELECT doc_id, $sqlShingles AS sh
       |      FROM (SELECT doc_id, ${sqlWords("text")} AS w FROM $src)),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh)) AS jaccard
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id
       |      WHERE len(a.sh) * $threshold <= len(b.sh)
       |        AND len(b.sh) * $threshold <= len(a.sh)),
       |jp AS (SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= $threshold)""".stripMargin

  private def jaccardPairsSql(threshold: Double): String =
    s"""WITH ${jaccardPairsCte(threshold)}
       |SELECT id_a, id_b, jaccard FROM jp ORDER BY id_a, id_b""".stripMargin

  // ---- text analysis ---------------------------------------------------

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Text.polyHash(col("text")).as("fp"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    s"""SELECT doc_id, ${sqlPolyHash("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_ws"),
        Text.subwordCount(col("text")).cast("long").as("n_subword"))
      .orderBy("doc_id")

  val tokenCountsSql: String =
    s"""SELECT doc_id,
       |  CAST(len(${sqlWords("text")}) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subword
       |FROM documents ORDER BY doc_id""".stripMargin

  def quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.qualityScore(col("text")).as("score"))
      .orderBy("doc_id")

  val qualitySql: String =
    s"""WITH q AS (SELECT doc_id,
       |    len(${sqlWords("text")}) AS n_tok,
       |    len(list_distinct(${sqlWords("text")})) AS n_uniq,
       |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
       |    length(text) AS n_char
       |  FROM documents)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       |  CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), n_tok / CAST(20.0 AS DOUBLE))
       |  + CAST(0.4 AS DOUBLE) * (n_uniq / CAST(n_tok AS DOUBLE))
       |  + CAST(0.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - n_punct / CAST(n_char AS DOUBLE)) AS score
       |FROM q ORDER BY doc_id""".stripMargin

  def langId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val langIdSql: String = {
    val scores = Text.LangMarkers.map { case (l, ws) =>
      s"len(list_intersect(w, [${ws.map(w => s"'$w'").mkString(",")}])) AS s_$l"
    }.mkString(",\n    ")
    val best = Text.LangMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val cases = Text.LangMarkers.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH tkn AS (SELECT doc_id, list_distinct(${sqlWords("lower(text)")}) AS w FROM documents),
       |sc AS (SELECT doc_id,
       |    $scores
       |  FROM tkn),
       |m AS (SELECT *, $best AS best FROM sc)
       |SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\d{3}-\\d{3}-\\d{4}"

  /** PII redaction — the scrub pass a training-data pipeline runs
    * before release: normalize emails and phone numbers to typed
    * placeholder tokens and count what was removed (the audit number a
    * compliance review wants). The synthetic corpus carries no PII, so
    * the query deterministically PLANTS one email and one phone per
    * document (derived from doc_id, identically in both engines) ahead
    * of a text prefix — the redactor is verified against non-trivial
    * input, not vacuously green. Both patterns avoid lookaround, so
    * Java regex (Spark) and RE2 (DuckDB) match identically. One
    * projection, shuffle-free below the declared sort — a map-only
    * pass at any scale.
    */
  def redact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(
          lit("contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" re: "), substring(col("text"), 1, 80)).as("txt"))
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("txt"), lit(EmailPat), lit("<EMAIL>")),
          lit(PhonePat), lit("<PHONE>")).as("redacted"),
        regexp_count(col("txt"), lit(EmailPat)).cast("long").as("n_email"),
        regexp_count(col("txt"), lit(PhonePat)).cast("long").as("n_phone"))
      .orderBy("doc_id")

  val redactSql: String =
    s"""WITH d AS (SELECT doc_id,
       |    'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 415-555-' ||
       |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' re: ' || substr(text, 1, 80) AS txt
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(txt, '$EmailPat', '<EMAIL>', 'g'),
       |    '$PhonePat', '<PHONE>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(txt, '$EmailPat')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(txt, '$PhonePat')) AS BIGINT) AS n_phone
       |FROM d ORDER BY doc_id""".stripMargin

  // TF-IDF top term, rare-token profile, repetition — corpus statistics
  // with log-free scoring (integer counts + one IEEE division) so both
  // engines compute bit-identical values (graft.operators.TextStats).

  def tfidfTopTerm(s: SparkSession, dir: String): DataFrame =
    TextStats.topTermPerDoc(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val tfidfTopTermSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlWords("text")}) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id, tok, tf, df, CAST(tf AS DOUBLE) / df AS score
       |       FROM tf JOIN df USING (tok))
       |SELECT doc_id, tok AS top_term, CAST(tf AS BIGINT) AS tf,
       |       CAST(df AS BIGINT) AS df, score
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, tok ASC) AS rn FROM sc)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  def rareTokens(s: SparkSession, dir: String): DataFrame =
    TextStats.rareTokenStats(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val rareTokensSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(${sqlWords("text")}) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_distinct,
       |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |  CAST(SUM(df) AS DOUBLE) / count(*) AS avg_df
       |FROM tf JOIN df USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def repetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextStats.repetitionScore(col("text")).as("repetition"))
      .orderBy("doc_id")

  val repetitionSql: String =
    s"""WITH w AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents)
       |SELECT doc_id,
       |  CASE WHEN len(w) >= 2
       |    THEN CAST(1.0 AS DOUBLE)
       |      - CAST(len(list_distinct(list_transform(range(1, len(w)),
       |          i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
       |        / CAST(len(w) - 1 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS repetition
       |FROM w ORDER BY doc_id""".stripMargin

  // ---- dedup -----------------------------------------------------------

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    TextDedup.exact(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("n_copies"))
      .orderBy("keep_id")

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // Exact-substring dedup (Lee et al. 2022): 64-char windows at stride
  // 8 occurring in ≥ 2 distinct documents — the cross-document
  // boilerplate whole-doc dedup can't see. Top-50 by occurrence with a
  // total-order tiebreak; the oracle replays the identical windowing.
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    TextDedup.repeatedSubstrings(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("win"))
      .limit(50)

  // DuckDB's generate_series takes constant bounds only (subquery
  // parameters are rejected by the binder), so the index list is a
  // generous constant range bounded per-doc by the join condition —
  // position set identical to Spark's sequence(1, len-63, 8). The guard
  // CTE (cross-joined so it always evaluates) makes the oracle FAIL
  // LOUDLY if a future testdata generation ever ships a document whose
  // position set would exceed the constant, instead of silently
  // hash-mismatching against the Spark side.
  val dedupSubstringSql: String =
    """WITH guard AS (
      |  SELECT CASE WHEN max(length(text)) > 100063
      |    THEN error('documents exceed the 100000-position substring-oracle cap')
      |    ELSE 1 END AS ok FROM documents),
      |idx AS (
      |  SELECT i FROM generate_series(1, 100000, 8) g(i) CROSS JOIN guard),
      |w AS (
      |  SELECT d.doc_id, substr(d.text, CAST(idx.i AS INTEGER), 64) AS win
      |  FROM documents d JOIN idx ON idx.i <= length(d.text) - 63
      |  WHERE length(d.text) >= 64)
      |SELECT win, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(count(*) AS BIGINT) AS n_occ
      |FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY n_occ DESC, n_docs DESC, win LIMIT 50""".stripMargin

  // The actionable cut: every doc with its cross-document repeated
  // 64-char spans REMOVED (interval-merged at the same stride lattice)
  // — output is the full cleaned text per doc plus the removed-char
  // count, so the hash gate certifies the reassembled strings byte for
  // byte against the relational replay.
  def dedupSubstringCut(s: SparkSession, dir: String): DataFrame =
    TextDedup.cutRepeatedSpans(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val dedupSubstringCutSql: String =
    """WITH guard AS (
      |  SELECT CASE WHEN max(length(text)) > 100063
      |    THEN error('documents exceed the 100000-position substring-oracle cap')
      |    ELSE 1 END AS ok FROM documents),
      |idx AS (
      |  SELECT i FROM generate_series(1, 100000, 8) g(i) CROSS JOIN guard),
      |pos AS (
      |  SELECT d.doc_id, CAST(idx.i AS INTEGER) AS pos,
      |         substr(d.text, CAST(idx.i AS INTEGER), 64) AS win
      |  FROM documents d JOIN idx ON idx.i <= length(d.text) - 63
      |  WHERE length(d.text) >= 64),
      |wins AS (SELECT win FROM pos GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT p.doc_id, p.pos AS s, p.pos + 63 AS e
      |        FROM pos p JOIN wins USING (win)),
      |m AS (SELECT doc_id, s, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |      FROM cov),
      |fl AS (SELECT *, CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END AS ni
      |       FROM m),
      |isl0 AS (SELECT *, sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
      |           ROWS UNBOUNDED PRECEDING) AS island FROM fl),
      |isl AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
      |        FROM isl0 GROUP BY 1, 2),
      |j AS (SELECT i.doc_id, i.island, i.s, i.e, d.text,
      |        coalesce(CAST(lag(i.e) OVER (PARTITION BY i.doc_id
      |          ORDER BY i.island) AS INTEGER), 0) AS preve
      |      FROM isl i JOIN documents d USING (doc_id)),
      |heads AS (SELECT doc_id, island,
      |            substr(text, preve + 1,
      |              greatest(CAST(s AS INTEGER) - preve - 1, 0)) AS piece
      |          FROM j),
      |tails AS (SELECT doc_id,
      |            substr(any_value(text), CAST(max(e) + 1 AS INTEGER)) AS tail
      |          FROM j GROUP BY doc_id),
      |cut AS (SELECT h.doc_id,
      |          string_agg(h.piece, '' ORDER BY h.island) || any_value(t.tail)
      |            AS text_clean
      |        FROM heads h JOIN tails t USING (doc_id) GROUP BY h.doc_id)
      |SELECT d.doc_id, coalesce(c.text_clean, d.text) AS text_clean,
      |       CAST(length(d.text) - length(coalesce(c.text_clean, d.text)) AS BIGINT)
      |         AS n_cut
      |FROM documents d LEFT JOIN cut c USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  def dedupNgram(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", ShingleK, 0.6)
      .orderBy("id_a", "id_b")

  val dedupNgramSql: String = jaccardPairsSql(0.6)

  /** Capped candidate generation + exact verify — the formulation that
    * survives stop-shingle skew at 100× (see
    * TextDedup.ngramJaccardPairsCapped). Oracle stays the naive exact
    * O(n²) form — NOTE this makes the gate a CORPUS-SPECIFIC recall
    * claim, asserted deliberately: on this testdata the capped
    * candidates cover every qualifying pair. The operator's general
    * contract is weaker (capped output ⊆ exact output; exact-duplicate
    * pairs always present — capping may legitimately drop near-dup
    * pairs whose shared shingles are all corpus-frequent), so if the
    * testdata is regenerated and this row goes red, check whether the
    * new corpus merely exercises that documented gap before suspecting
    * the implementation; the subset+exact-dup contract is what
    * DedupAndSimilaritySpec asserts corpus-independently.
    */
  def dedupNgramCapped(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramJaccardPairsCapped(t(s, dir, "documents"), "doc_id", "text",
        ShingleK, 0.6, maxShingleFreq = 50)
      .orderBy("id_a", "id_b")

  /** Transitive near-dup clustering: connected components over the
    * ngram-Jaccard pair graph, label = min reachable doc_id. The oracle
    * replays reachability as a recursive CTE over the O(n²) exact pair
    * set — checking both the pair generation AND the iterative label
    * propagation.
    */
  def dedupComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextDedup.connectedComponents(docs, "doc_id",
        TextDedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleK, 0.6))
      .orderBy("doc_id")
  }

  val dedupComponentsSql: String =
    s"""WITH RECURSIVE ${jaccardPairsCte(0.6)},
       |e AS (SELECT id_a AS src, id_b AS dst FROM jp
       |      UNION ALL SELECT id_b, id_a FROM jp),
       |r(id, comp) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, r.comp FROM e JOIN r ON r.id = e.dst)
       |SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS component
       |FROM r GROUP BY id ORDER BY doc_id""".stripMargin

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text", ShingleK, 0.8)
      .orderBy("id_a", "id_b")

  val dedupMinhashSql: String = jaccardPairsSql(0.8)

  /** Shared CTE prefix computing the 60-bit SimHash signature per doc —
    * mirrors TextDedup.simhashSignatures exactly (two polyhash bases,
    * bit-sum vote, bit recombination).
    */
  private val simhashSigSql: String = {
    val bits = TextDedup.SimhashBits
    val sums = (0 until bits).map { j =>
      s"SUM(CASE WHEN (hv // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n    ")
    val combine = (0 until bits).map { j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""tk AS (SELECT doc_id, unnest(list_distinct(${sqlWords("text")})) AS tok FROM documents),
       |h AS (SELECT doc_id,
       |    ${sqlPolyHash("tok")} + ${sqlPolyHash("tok", Text.HashBase2)} * ${1L << 30} AS hv
       |  FROM tk),
       |sm AS (SELECT doc_id,
       |    $sums
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM sm)""".stripMargin
  }

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashSignatures(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  val dedupSimhashSql: String =
    s"""WITH $simhashSigSql
       |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin

  private val SimhashMaxHamming = 2

  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = SimhashMaxHamming)
      .orderBy("id_a", "id_b")

  /** O(n²) exact hamming check — the textbook definition the chunked
    * equi-join must reproduce (full recall by pigeonhole).
    */
  val simhashPairsSql: String =
    s"""WITH $simhashSigSql
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming
       |ORDER BY id_a, id_b""".stripMargin

  // ---- data-quality expectations ----------------------------------------

  /** Declarative quality gate (graft.ops.Quality — the DLT-expectations
    * analog): five named rules over orders, reported as per-rule
    * fail counts + rates from ONE map-side aggregate scan. The rules
    * mix pass-all, partial-fail, and regex shapes so the metric path,
    * not just the happy path, is hash-checked. NULL rule results count
    * as failures (pipeline-gate semantics, not SQL CHECK).
    */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Quality
    val rules = Seq(
      Quality.Rule("custkey_present", col("o_custkey").isNotNull),
      Quality.Rule("date_pre_2001",
        to_date(col("o_orderdate")) < lit("2001-01-01").cast("date")),
      Quality.Rule("price_le_200k", col("o_totalprice") <= 200000.0),
      Quality.Rule("priority_high_fmt", col("o_orderpriority").rlike("^[12]-")),
      Quality.Rule("status_final", col("o_orderstatus").isin("F", "O")))
    Quality.summary(t(s, dir, "orders"), rules).orderBy("rule")
  }

  val expectationsSql: String = {
    val rules = Seq(
      "custkey_present" -> "o_custkey IS NOT NULL",
      "date_pre_2001" -> "CAST(o_orderdate AS DATE) < DATE '2001-01-01'",
      "price_le_200k" -> "o_totalprice <= 200000.0",
      "priority_high_fmt" -> "regexp_matches(o_orderpriority, '^[12]-')",
      "status_final" -> "o_orderstatus IN ('F', 'O')")
    val aggs = rules.map { case (n, c) =>
      s"CAST(SUM(CASE WHEN coalesce($c, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS f_$n" }
      .mkString(", ")
    val arms = rules.map { case (n, _) =>
      s"SELECT '$n' AS rule, n_rows, f_$n AS n_fail FROM m" }
      .mkString("\n  UNION ALL ")
    s"""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, $aggs FROM orders)
       |SELECT rule, n_rows, n_fail, n_fail / n_rows AS fail_rate FROM (
       |  $arms)
       |ORDER BY rule""".stripMargin
  }

  // ---- pure-SQL surface ---------------------------------------------------

  /** The SQL-only client path under the oracle gate: a temp view plus
    * the `GraftExtensions`-registered functions, executed through
    * `spark.sql` — the same fused Catalyst expressions the Column API
    * plans, so the session-extension registration path itself (not just
    * the expressions) is hash-checked against DuckDB's replay of the
    * identical algorithms.
    */
  def sqlSurface(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s) // idempotent re-registration
    t(s, dir, "documents").createOrReplaceTempView("graft_sql_docs")
    s.sql(
      """SELECT doc_id,
        |  graft_polyhash(text) AS fp,
        |  CAST(size(graft_word_shingles(text, 3)) AS BIGINT) AS n_shingles
        |FROM graft_sql_docs ORDER BY doc_id""".stripMargin)
  }

  val sqlSurfaceSql: String =
    s"""WITH d AS (SELECT doc_id, text, ${sqlWords("text")} AS w FROM documents)
       |SELECT doc_id, ${sqlPolyHash("text")} AS fp,
       |  CAST(len($sqlShingles) AS BIGINT) AS n_shingles
       |FROM d ORDER BY doc_id""".stripMargin

  // ---- context-window prep: chunking + sequence packing ------------------

  private val ChunkSize = 32   // tokens per chunk
  private val ChunkStride = 24 // overlap = ChunkSize - ChunkStride

  /** Overlapping fixed-size token chunking — the context-window prep op
    * (RAG indexing, long-doc training): each doc explodes into
    * ceil-stride windows of `ChunkSize` tokens every `ChunkStride`.
    * Shape: per-row `sequence` + `explode` + `slice` — pipeline-local
    * like f23 (no shuffle; output partitioning follows the input), so
    * at 100 TB it scales linearly and the chunk table lands ready for
    * downstream embedding without a repartition. Chunk count is
    * `(max(n−size,0) + stride−1) div stride + 1`: every token is
    * covered, the last chunk may be short, a short doc yields exactly
    * one chunk.
    */
  def chunk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      // `div`, not `/`: Column./ on longs is DOUBLE division
      .withColumn("cidx", explode(sequence(lit(0L),
        expr(s"(greatest(n - $ChunkSize, 0L) + ${ChunkStride - 1}) div $ChunkStride"))))
      .withColumn("ck", slice(col("w"),
        (col("cidx") * ChunkStride + 1).cast("int"), lit(ChunkSize)))
      .select(
        col("doc_id"),
        (col("cidx") + 1).as("chunk_id"),
        size(col("ck")).cast("long").as("chunk_tok"),
        concat_ws(" ", col("ck")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  val chunkSql: String =
    s"""WITH d AS (SELECT doc_id, ${sqlWords("text")} AS w FROM documents),
       |c AS (SELECT doc_id, w,
       |        unnest(range(0, (greatest(len(w) - $ChunkSize, 0) + ${ChunkStride - 1})
       |                        // $ChunkStride + 1)) AS cidx
       |      FROM d)
       |SELECT doc_id, CAST(cidx + 1 AS BIGINT) AS chunk_id,
       |  CAST(len(w[cidx*$ChunkStride + 1 : cidx*$ChunkStride + $ChunkSize]) AS BIGINT) AS chunk_tok,
       |  array_to_string(w[cidx*$ChunkStride + 1 : cidx*$ChunkStride + $ChunkSize], ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  private val PackBudget = 256L // tokens per packed context window

  private val PackShardSpan = 64L // contiguous doc_ids per prefix-sum shard

  /** Sequence packing, concat-and-cut form (GPT-style pretraining: all
    * docs are concatenated in doc_id order and the token stream is cut
    * every `PackBudget` tokens). A global running token offset is a
    * distributed PREFIX SUM, and a bare `Window.orderBy` would compute
    * it on ONE partition — the classic scale killer — so this uses the
    * two-pass formulation: contiguous `doc_id div span` shards each
    * compute their local running sum in parallel, per-shard totals
    * (#shards rows, trivially small) get their own running sum, and a
    * broadcast join adds each shard's base offset. Emits each doc's map
    * into the packed stream: offset, first/last bin, bins spanned —
    * exactly what a loader needs to slice examples back out.
    */
  def pack(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $PackShardSpan"))
    val within = W.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(W.unboundedPreceding, -1)
    val bases = docs.groupBy("shard").agg(sum("n_tok").as("tot"))
      .withColumn("base", coalesce(sum(col("tot"))
        .over(W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "base")
    docs
      .withColumn("within", coalesce(sum(col("n_tok")).over(within), lit(0L)))
      .join(broadcast(bases), "shard")
      .withColumn("tok_offset", col("base") + col("within"))
      // `div` keeps the bin math in exact long arithmetic end to end
      .withColumn("first_bin", expr(s"tok_offset div $PackBudget"))
      .withColumn("last_bin", expr(s"(tok_offset + n_tok - 1) div $PackBudget"))
      .select(
        col("doc_id"), col("n_tok"), col("tok_offset"),
        col("first_bin"), col("last_bin"),
        (col("last_bin") - col("first_bin") + 1).as("bins_spanned"))
      .orderBy("doc_id")
  }

  val packSql: String =
    s"""WITH d AS (SELECT doc_id, CAST(len(${sqlWords("text")}) AS BIGINT) AS n_tok
       |           FROM documents),
       |o AS (SELECT doc_id, n_tok,
       |        coalesce(SUM(n_tok) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t_off
       |      FROM d)
       |SELECT doc_id, n_tok, CAST(t_off AS BIGINT) AS tok_offset,
       |  CAST(t_off // $PackBudget AS BIGINT) AS first_bin,
       |  CAST((t_off + n_tok - 1) // $PackBudget AS BIGINT) AS last_bin,
       |  CAST((t_off + n_tok - 1) // $PackBudget - t_off // $PackBudget + 1 AS BIGINT)
       |    AS bins_spanned
       |FROM o ORDER BY doc_id""".stripMargin

  /** Sequence packing, no-split form (the document-boundary-respecting
    * shape trainers use when examples must not cross a context window:
    * truncating a document mid-attention-span measurably hurts — the
    * motivation behind best-fit packing): within each doc_id shard,
    * walk docs in id order and open a new bin whenever the next doc
    * would overflow the budget; over-long docs are truncated to one
    * full window. Greedy bin state resets at data-dependent boundaries,
    * so this is NOT a prefix sum — it's a per-shard sequential fold,
    * expressed as a Catalyst `aggregate` HOF over the shard's collected
    * doc list: shard-bounded memory (PackShardSpan docs), zero
    * cross-shard dependency (unlike x_pack's global offset, no
    * second pass is needed — ONE shuffle to group shards, then
    * embarrassingly parallel). Bin ids are globally unique as
    * shard · span + local bin (each doc opens at most one bin, so
    * local bin < span). The DuckDB oracle replays the same walk as a
    * recursive CTE stepping row_number within shard.
    */
  def packNosplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $PackShardSpan"))
      .withColumn("n_eff", least(col("n_tok"), lit(PackBudget)))
    docs
      .groupBy("shard")
      .agg(array_sort(collect_list(
        struct(col("doc_id"), col("n_tok"), col("n_eff")))).as("ds"))
      .select(col("shard"), explode(expr(
        s"""aggregate(
           |  ds,
           |  struct(
           |    cast(0 as int) as bin,
           |    cast(0 as bigint) as fill,
           |    slice(transform(ds, d -> struct(d.doc_id as doc_id, d.n_tok as n_tok,
           |      d.n_eff as n_eff, cast(0 as int) as bin, cast(0 as bigint) as off)), 1, 0) as out),
           |  (acc, d) -> if(acc.fill + d.n_eff <= $PackBudget,
           |    struct(acc.bin as bin, acc.fill + d.n_eff as fill,
           |      array_append(acc.out, struct(d.doc_id as doc_id, d.n_tok as n_tok,
           |        d.n_eff as n_eff, acc.bin as bin, acc.fill as off)) as out),
           |    struct(acc.bin + 1 as bin, d.n_eff as fill,
           |      array_append(acc.out, struct(d.doc_id as doc_id, d.n_tok as n_tok,
           |        d.n_eff as n_eff, acc.bin + 1 as bin, cast(0 as bigint) as off)) as out)),
           |  acc -> acc.out)""".stripMargin)).as("p"))
      .select(
        col("p.doc_id").as("doc_id"),
        col("p.n_tok").as("n_tok"),
        col("p.n_eff").as("n_eff"),
        (col("shard") * lit(PackShardSpan) + col("p.bin")).as("bin_id"),
        col("p.off").as("bin_off"))
      .orderBy("doc_id")
  }

  val packNosplitSql: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, CAST(len(${sqlWords("text")}) AS BIGINT) AS n_tok,
       |         doc_id // $PackShardSpan AS shard
       |  FROM documents),
       |r AS (SELECT shard, doc_id, n_tok, least(n_tok, $PackBudget) AS n_eff,
       |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
       |      FROM d),
       |walk AS (
       |  SELECT shard, rn, doc_id, n_tok, n_eff,
       |         0 AS bin, CAST(0 AS BIGINT) AS boff, n_eff AS fill
       |  FROM r WHERE rn = 1
       |  UNION ALL
       |  SELECT r.shard, r.rn, r.doc_id, r.n_tok, r.n_eff,
       |    CASE WHEN w.fill + r.n_eff <= $PackBudget THEN w.bin ELSE w.bin + 1 END,
       |    CASE WHEN w.fill + r.n_eff <= $PackBudget THEN w.fill ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN w.fill + r.n_eff <= $PackBudget THEN w.fill + r.n_eff ELSE r.n_eff END
       |  FROM walk w JOIN r ON r.shard = w.shard AND r.rn = w.rn + 1)
       |SELECT doc_id, n_tok, CAST(n_eff AS BIGINT) AS n_eff,
       |  CAST(shard * $PackShardSpan + bin AS BIGINT) AS bin_id,
       |  CAST(boff AS BIGINT) AS bin_off
       |FROM walk ORDER BY doc_id""".stripMargin

  // ---- end-to-end curation ----------------------------------------------

  /** The capstone: the full curation pipeline (language filter, quality
    * floor, repetition ceiling, transitive near-dup removal, per-cluster
    * representative) hash-checked as ONE query. The oracle recomputes
    * every stage in SQL: inline lang/quality/repetition scoring, the
    * exact O(n²) pair graph over kept docs, recursive-CTE components,
    * and min-id representative selection.
    */
  def curate(s: SparkSession, dir: String): DataFrame =
    Curation.curate(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** The one Scala-side constant the LSH-curation oracle must agree
    * with — threaded through Thresholds, the pairGen closure, and
    * `curateSqlAt` so the three sites cannot drift.
    */
  private val CurateLshJaccard = 0.8

  /** The same pipeline with the near-dup stage routed through
    * MinHash+LSH candidate generation — the swap a 100 TB user makes
    * when the profiled dominant stage (pair generation; BASELINE.md)
    * must follow band collisions instead of shingle df. Runs at J ≥
    * 0.8, where the (1−J⁴)³² band-miss probability is < 5e-8 and the
    * verified LSH output provably equals the exact pair set the oracle
    * computes (the same recall contract x_dedup_minhash is gated on —
    * at 0.6 the miss rate would be ~1% and the oracle would diverge).
    */
  def curateLsh(s: SparkSession, dir: String): DataFrame = {
    val th = Curation.Thresholds(jaccard = CurateLshJaccard)
    Curation.curateWith(t(s, dir, "documents"), "doc_id", "text", th,
        kept => TextDedup.minhashLshPairs(kept, "doc_id", "text", ShingleK, th.jaccard))
      .orderBy("doc_id")
  }

  val curateSql: String = curateSqlAt(0.6)
  val curateLshSql: String = curateSqlAt(CurateLshJaccard)

  private def curateSqlAt(jaccard: Double): String = {
    val markers = Text.LangMarkers.map { case (l, ws) =>
      l -> s"len(list_intersect(lw, [${ws.map(w => s"'$w'").mkString(",")}]))"
    }
    val best = markers.map(_._2).mkString("greatest(", ", ", ")")
    val langCase = markers.map { case (l, e) =>
      s"WHEN $e = best AND $e > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH RECURSIVE lw AS (
       |  SELECT doc_id, text,
       |    list_distinct(${sqlWords("lower(text)")}) AS lw,
       |    ${sqlWords("text")} AS w
       |  FROM documents),
       |m AS (SELECT doc_id, text, w, $best AS best, lw FROM lw),
       |scored AS (SELECT doc_id, text, w,
       |    CASE $langCase ELSE 'und' END AS lang_pred,
       |    CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), len(w) / CAST(20.0 AS DOUBLE))
       |      + CAST(0.4 AS DOUBLE) * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
       |      + CAST(0.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
       |          - len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) / CAST(length(text) AS DOUBLE)) AS score,
       |    CASE WHEN len(w) >= 2
       |      THEN CAST(1.0 AS DOUBLE)
       |        - CAST(len(list_distinct(list_transform(range(1, len(w)),
       |            i -> w[i] || ' ' || w[i+1]))) AS DOUBLE) / CAST(len(w) - 1 AS DOUBLE)
       |      ELSE CAST(0.0 AS DOUBLE) END AS repetition
       |  FROM m),
       |kept AS (SELECT doc_id, text, lang_pred, score, repetition FROM scored
       |         WHERE lang_pred = 'en' AND score >= 0.5 AND repetition <= 0.2),
       |${jaccardPairsCte(jaccard, "kept")},
       |e AS (SELECT id_a AS src, id_b AS dst FROM jp
       |      UNION ALL SELECT id_b, id_a FROM jp),
       |r(id, comp) AS (
       |  SELECT doc_id, doc_id FROM kept
       |  UNION
       |  SELECT e.src, r.comp FROM e JOIN r ON r.id = e.dst),
       |comp AS (SELECT id AS doc_id, min(comp) AS component FROM r GROUP BY id)
       |SELECT k.doc_id, k.lang_pred, k.score, k.repetition
       |FROM kept k JOIN comp c ON k.doc_id = c.doc_id
       |WHERE k.doc_id = c.component
       |ORDER BY k.doc_id""".stripMargin
  }

  // ---- embedding similarity ---------------------------------------------

  private val EmbedThreshold = 0.35

  def embedPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForcePairs(t(s, dir, "embeddings"), "vec_id", "embedding", EmbedThreshold)
      .orderBy("id_a", "id_b")

  val embedPairsSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos FROM p WHERE cos >= $EmbedThreshold
       |ORDER BY id_a, id_b""".stripMargin

  // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
  // drop every vector that has a near-duplicate (cosine ≥ threshold)
  // with a smaller id; the smallest id of each near-dup star survives
  // as the canonical copy. Candidate generation is the same blocked
  // equi-join as x_embed_pairs (no nested loop, PlanAuditSpec's
  // contract); the retention pass is one anti-join against the
  // dropped-id set — at 100 TB both sides stay shuffle-bounded.
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dropped = Similarity
      .bruteForcePairs(emb, "vec_id", "embedding", EmbedThreshold)
      .select(col("id_b").as("vec_id")).distinct()
    emb.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy("vec_id")
  }

  val semDedupSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id),
       |dropped AS (SELECT DISTINCT id_b FROM p WHERE cos >= $EmbedThreshold)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
       |FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id_b
       |WHERE d.id_b IS NULL
       |ORDER BY e.vec_id""".stripMargin

  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .orderBy("q_id", "rank")
  }

  val annTopKSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v),
       |q AS (SELECT * FROM n WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |         ${sqlDot("c.e", "q.e")} / (c.nrm * q.nrm) AS cos
       |       FROM n c JOIN q ON c.vec_id != q.vec_id)
       |SELECT q_id, vec_id, rank, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM sc) WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  // Quantized ANN: int8-style scalar-quantized corpus searched by exact
  // queries — the disk-ANN storage layout. The oracle replays the
  // quantization (round half away from zero, identical in both engines)
  // and the scoring, so codes AND ranking are hash-checked.
  def annQuantized(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val corpus = Quantize.dequantized(
      Quantize.scalarQuantize(emb, "vec_id", "embedding"))
      .select(col("id").as("vec_id"), col("vec").as("embedding"))
    Similarity.bruteForceTopK(corpus, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .orderBy("q_id", "rank")
  }

  val annQuantizedSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |qz AS (SELECT vec_id,
       |    list_aggregate(list_transform(e, x -> abs(x)), 'max') / CAST(127.0 AS DOUBLE) AS scale, e
       |  FROM v),
       |dq AS (SELECT vec_id,
       |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0.0 AS DOUBLE))
       |         ELSE list_transform(e, x -> round(x / scale) * scale) END AS e
       |  FROM qz),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM dq),
       |q AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |         ${sqlDot("c.e", "q.e")} / (c.nrm * q.nrm) AS cos
       |       FROM n c JOIN q ON c.vec_id != q.vec_id)
       |SELECT q_id, vec_id, rank, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM sc) WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  // Hyperplane-LSH near-dup pairs. The oracle runs the SAME deterministic
  // algorithm (the ±1 sign matrix is a pure function of (nbits, dim),
  // embedded as a literal in both plans), so candidate generation AND
  // verification are hash-checked — this validates the distributed
  // banding implementation; recall-vs-exact is the documented algorithm
  // property, tunable via (r, bands) for the near-dup regime.
  private val LshBits = 64
  private val LshR = 8
  private val LshDim = 64
  private val LshThreshold = 0.4

  def embedLsh(s: SparkSession, dir: String): DataFrame =
    HyperplaneLsh.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = LshDim, threshold = LshThreshold, nbits = LshBits, r = LshR)
      .orderBy("id_a", "id_b")

  val embedLshSql: String = {
    val signs = HyperplaneLsh.signMatrix(LshBits, LshDim)
    val matrix = signs.map(_.map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")).mkString("[", ",\n      ", "]")
    val nBands = LshBits / LshR
    val bandExpr = (0 until nBands).map { b =>
      (0 until LshR).map(i => s"bit[${b * LshR + i + 1}]*${1L << i}").mkString(" + ")
    }.mkString("[", ",\n      ", "]")
    val dotSign =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(1, ${LshDim + 1}), i -> e[i] * signs[k][i])), (acc,v) -> acc+v)"
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v),
       |m AS (SELECT $matrix AS signs),
       |bits AS (SELECT vec_id,
       |    list_transform(range(1, ${LshBits + 1}),
       |      k -> CASE WHEN $dotSign > 0 THEN 1 ELSE 0 END) AS bit
       |  FROM n, m),
       |bk AS (SELECT vec_id, $bandExpr AS keys FROM bits),
       |banded AS (SELECT vec_id, i - 1 AS band, keys[i] AS key
       |           FROM bk, range(1, ${nBands + 1}) t(i)),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
       |p AS (SELECT id_a, id_b, ${sqlDot("x.e", "y.e")} / (x.nrm * y.nrm) AS cos
       |      FROM cand JOIN n x ON cand.id_a = x.vec_id
       |                JOIN n y ON cand.id_b = y.vec_id)
       |SELECT id_a, id_b, cos FROM p WHERE cos >= $LshThreshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 32, nprobe = 4)
      .orderBy("q_id", "rank")
  }

  /** IVF is approximate w.r.t. exact top-k, but fully deterministic —
    * so the oracle replays the SAME algorithm (codebook = 32 lowest-id
    * vectors, argmax assignment with (cos desc, id asc) tiebreak, probe
    * 4 lists, exact rank within candidates) and the distributed
    * implementation is hash-checked end to end, like x_embed_lsh.
    */
  val annIvfSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v),
       |cent AS (SELECT vec_id AS c_id, e AS c_e, nrm AS c_n FROM n
       |         ORDER BY vec_id LIMIT 32),
       |assign AS (SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, cent.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${sqlDot("n.e", "cent.c_e")} / (n.nrm * cent.c_n) DESC,
       |                      cent.c_id ASC) AS cr
       |    FROM n, cent) WHERE cr = 1),
       |qs AS (SELECT vec_id AS q_id, c_id FROM (
       |    SELECT n.vec_id, cent.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${sqlDot("n.e", "cent.c_e")} / (n.nrm * cent.c_n) DESC,
       |                      cent.c_id ASC) AS cr
       |    FROM n, cent WHERE n.vec_id < 10) WHERE cr <= 4),
       |scored AS (SELECT qs.q_id, a.vec_id,
       |      ${sqlDot("x.e", "y.e")} / (x.nrm * y.nrm) AS cos
       |    FROM assign a JOIN qs ON a.c_id = qs.c_id AND a.vec_id != qs.q_id
       |    JOIN n x ON x.vec_id = a.vec_id
       |    JOIN n y ON y.vec_id = qs.q_id)
       |SELECT q_id, vec_id, rank, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** IVF with a TRAINED codebook: `IvfTrainIters` rounds of the
    * deterministic fixed-point k-means (Similarity.kmeansCodebook). The
    * oracle unrolls the SAME rounds in SQL — integer (×2²⁰) centroid
    * accumulators make the means order-independent, so the trained
    * centroids (and therefore assignment, probing, and ranking) are
    * bit-identical across engines and the whole trainer is hash-checked.
    *
    * Recall caveat, measured via x_ann_recall: the synthetic embeddings
    * are UNIFORM random (within-label mean cosine ≈ cross-label ≈ 0),
    * so there is no cluster structure for k-means to recover and
    * trained recall ≈ seed recall (±2 hits of noise) on this testdata.
    * On corpora with real cluster structure the trained codebook is
    * what balances lists and lifts recall-per-probe; the measurement
    * exists precisely so that shows up as a number, not a claim.
    */
  private val IvfTrainIters = 2
  private val EmbedDim = 64

  def annIvfTrained(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 32, nprobe = 4, trainIters = IvfTrainIters)
      .orderBy("q_id", "rank")
  }

  /** Shared oracle CTE text: the deterministic fixed-point k-means
    * trainer (`IvfTrainIters` unrolled rounds — the SQL twin of
    * Similarity.kmeansCodebook) up through `assign`, the per-vector
    * argmax centroid assignment. Factored so the trained-IVF and the
    * cluster-blocked-SemDeDup oracles replay the SAME trainer text — a
    * parameter change cannot silently diverge the two.
    */
  private def trainedAssignCtes: String = {
    val scale = graft.operators.Similarity.KmeansScale
    val rounds = (1 to IvfTrainIters).map { i =>
      val prev = s"c${i - 1}"
      s"""a$i AS (SELECT vec_id, qv, c_id FROM (
         |    SELECT n.vec_id, n.qv, c.c_id,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY ${sqlDot("n.e", "c.c_e")} / (n.nrm * c.c_n) DESC,
         |                      c.c_id ASC) AS cr
         |    FROM n, $prev c) WHERE cr = 1),
         |s$i AS (SELECT c_id, d, SUM(qv[d]) AS qs, count(*) AS nm
         |        FROM a$i, range(1, ${EmbedDim + 1}) t(d) GROUP BY 1, 2),
         |t$i AS (SELECT c_id,
         |          list(CAST(qs AS DOUBLE) / CAST(nm * $scale AS DOUBLE) ORDER BY d) AS c_e
         |        FROM s$i GROUP BY c_id),
         |c$i AS (SELECT c_id, c_e, sqrt(${sqlDot("c_e", "c_e")}) AS c_n FROM (
         |    SELECT p.c_id, coalesce(t.c_e, p.c_e) AS c_e
         |    FROM $prev p LEFT JOIN t$i t USING (c_id)))""".stripMargin
    }.mkString(",\n")
    val cT = s"c$IvfTrainIters"
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm,
       |        list_transform(e, x -> CAST(round(x * $scale.0) AS BIGINT)) AS qv
       |      FROM v),
       |c0 AS (SELECT vec_id AS c_id, e AS c_e, nrm AS c_n FROM n
       |       ORDER BY vec_id LIMIT 32),
       |$rounds,
       |assign AS (SELECT vec_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${sqlDot("n.e", "c.c_e")} / (n.nrm * c.c_n) DESC,
       |                      c.c_id ASC) AS cr
       |    FROM n, $cT c) WHERE cr = 1)""".stripMargin
  }

  val annIvfTrainedSql: String = {
    val cT = s"c$IvfTrainIters"
    s"""WITH $trainedAssignCtes,
       |qprobe AS (SELECT vec_id AS q_id, c_id FROM (
       |    SELECT n.vec_id, c.c_id,
       |           row_number() OVER (PARTITION BY n.vec_id
       |             ORDER BY ${sqlDot("n.e", "c.c_e")} / (n.nrm * c.c_n) DESC,
       |                      c.c_id ASC) AS cr
       |    FROM n, $cT c WHERE n.vec_id < 10) WHERE cr <= 4),
       |scored AS (SELECT qprobe.q_id, a.vec_id,
       |      ${sqlDot("x.e", "y.e")} / (x.nrm * y.nrm) AS cos
       |    FROM assign a JOIN qprobe ON a.c_id = qprobe.c_id AND a.vec_id != qprobe.q_id
       |    JOIN n x ON x.vec_id = a.vec_id
       |    JOIN n y ON y.vec_id = qprobe.q_id)
       |SELECT q_id, vec_id, rank, cos FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Cluster-blocked SemDeDup — the SCALE form of x_semdedup (Abbas
    * et al. 2023's actual formulation: k-means first, dedup within
    * clusters). Candidate generation routes through the trained
    * codebook (Similarity.clusterBlockedPairs), so the compute is
    * Σ|cluster|² instead of x_semdedup's exact all-pairs n² — at
    * 100 TB that is the difference between a per-cluster job and a job
    * that never finishes. Fully deterministic (fixed-point trainer,
    * argmax tiebreaks), so the oracle replays the SAME algorithm via
    * the shared `trainedAssignCtes` trainer text and the whole path —
    * training, assignment, within-cluster pairs, survivor set — is
    * hash-checked; x_semdedup stays as the exact twin measuring the
    * recall trade.
    */
  def semDedupIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dropped = Similarity.clusterBlockedPairs(emb, "vec_id", "embedding",
        EmbedThreshold, nlist = 32, trainIters = IvfTrainIters)
      .select(col("id_b").as("vec_id")).distinct()
    emb.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy("vec_id")
  }

  val semDedupIvfSql: String =
    s"""WITH $trainedAssignCtes,
       |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${sqlDot("x.e", "y.e")} / (x.nrm * y.nrm) AS cos
       |      FROM assign a JOIN assign b
       |        ON a.c_id = b.c_id AND a.vec_id < b.vec_id
       |      JOIN n x ON x.vec_id = a.vec_id
       |      JOIN n y ON y.vec_id = b.vec_id),
       |dropped AS (SELECT DISTINCT id_b FROM pairs WHERE cos >= $EmbedThreshold)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
       |FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id_b
       |WHERE d.id_b IS NULL
       |ORDER BY e.vec_id""".stripMargin

  /** Semantic domain balancing: temperature-sample over TRAINED k-means
    * clusters instead of labeled source domains — the data-mixing step
    * when no domain labels exist (cluster the corpus semantically, then
    * rebalance cluster mass before sampling). Pure composition of two
    * proven pieces: Similarity.assignClusters (the broadcast-argmax
    * corpus partitioning shared with IVF search and SemDeDup) +
    * Splits.temperatureSample (integer ppm keep rates, pure-hash
    * selection — zero shuffle beyond the cluster-count agg). The oracle
    * replays the same fixed-point trainer via `trainedAssignCtes`, then
    * x_mixture_sample's rate/hash text over the assignment.
    */
  def clusterBalance(s: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.temperatureSample(
      Similarity.assignClusters(t(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 32, trainIters = IvfTrainIters),
      "c_id", "id", salt = "cbal")
    .orderBy("c_id")

  val clusterBalanceSql: String =
    s"""WITH $trainedAssignCtes,
       |cc AS (SELECT c_id, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM assign GROUP BY c_id),
       |m AS (SELECT min(n_docs) AS n_min FROM cc),
       |r AS (SELECT c_id, n_docs,
       |        CAST(floor(CAST(1000000.0 AS DOUBLE) *
       |          sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)))
       |          AS BIGINT) AS rate_ppm
       |      FROM cc, m)
       |SELECT r.c_id, r.n_docs, r.rate_ppm,
       |  CAST(sum(CASE WHEN
       |      ${sqlPolyHash("CAST(a.vec_id AS VARCHAR) || ':cbal'")} % 1000000
       |      < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM assign a JOIN r USING (c_id)
       |GROUP BY r.c_id, r.n_docs, r.rate_ppm
       |ORDER BY r.c_id""".stripMargin

  /** recall@k of every approximate tier against the exact answer, AS A
    * CHECKED QUERY — the accuracy/speed trade is auditable per round
    * instead of asserted in comments. Top-k tiers (IVF, trained IVF,
    * quantized) score hits against the brute-force top-5; the LSH pair
    * tier scores recovered exact pairs at its own threshold. Counts are
    * integers and recall is ONE division, so the oracle (which replays
    * each tier with its same-algorithm SQL) matches bit-exactly.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    // Each tier IS the corresponding declared query function — no
    // restated hyperparameters or duplicated pipelines, so the recall
    // rows always describe exactly the configuration the hash-checked
    // queries x_ann_{topk,ivf,ivf_trained,quantized} / x_embed_lsh run;
    // a parameter change there flows into this audit automatically.
    val bf = annTopK(s, dir).select(col("q_id"), col("vec_id"))
      .localCheckpoint() // exact baseline ranked ONCE, reused by three tiers
    def recallOf(name: String, approx: DataFrame, base: DataFrame, keys: Seq[String]) =
      // the approx side is k rows per query (50 here; k×|queries| at any
      // scale) — broadcast it explicitly so the tier comparison is a
      // map-side join against the baseline, never a shuffle, without
      // waiting on AQE to notice
      base.join(broadcast(approx.withColumn("__hit", lit(1L))), keys, "left")
        .agg(
          sum(coalesce(col("__hit"), lit(0L))).as("hits"),
          count(lit(1)).as("total"))
        .select(
          lit(name).as("tier"), col("hits"), col("total"),
          (col("hits").cast("double") / col("total").cast("double")).as("recall"))
    val tiers = Seq(
      recallOf("ivf", annIvf(s, dir).select("q_id", "vec_id"), bf, Seq("q_id", "vec_id")),
      recallOf("ivf_trained",
        annIvfTrained(s, dir).select("q_id", "vec_id"), bf, Seq("q_id", "vec_id")),
      recallOf("lsh_pairs",
        embedLsh(s, dir).select("id_a", "id_b"),
        // exact pair baseline at the LSH tier's own threshold
        Similarity.bruteForcePairs(t(s, dir, "embeddings"), "vec_id", "embedding", LshThreshold)
          .select("id_a", "id_b"),
        Seq("id_a", "id_b")),
      recallOf("quantized",
        annQuantized(s, dir).select("q_id", "vec_id"), bf, Seq("q_id", "vec_id")))
    tiers.reduce(_.union(_)).orderBy("tier")
  }

  val annRecallSql: String = {
    def topkTier(name: String, sql: String) =
      s"""SELECT '$name' AS tier,
         |  (SELECT count(*) FROM bf JOIN (SELECT q_id, vec_id FROM ($sql)) a
         |     USING (q_id, vec_id)) AS hits,
         |  (SELECT count(*) FROM bf) AS total,
         |  CAST((SELECT count(*) FROM bf JOIN (SELECT q_id, vec_id FROM ($sql)) a
         |     USING (q_id, vec_id)) AS DOUBLE)
         |    / CAST((SELECT count(*) FROM bf) AS DOUBLE) AS recall""".stripMargin
    val exactPairs =
      s"""SELECT id_a, id_b FROM (
         |  WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |  n AS (SELECT vec_id, e, sqrt(${sqlDot("e", "e")}) AS nrm FROM v)
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id
         |  WHERE ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) >= $LshThreshold)""".stripMargin
    val lshTier =
      s"""SELECT 'lsh_pairs' AS tier,
         |  (SELECT count(*) FROM ex JOIN (SELECT id_a, id_b FROM ($embedLshSql)) l
         |     USING (id_a, id_b)) AS hits,
         |  (SELECT count(*) FROM ex) AS total,
         |  CAST((SELECT count(*) FROM ex JOIN (SELECT id_a, id_b FROM ($embedLshSql)) l
         |     USING (id_a, id_b)) AS DOUBLE)
         |    / CAST((SELECT count(*) FROM ex) AS DOUBLE) AS recall""".stripMargin
    s"""WITH bf AS (SELECT q_id, vec_id FROM ($annTopKSql)),
       |ex AS ($exactPairs)
       |SELECT tier, CAST(hits AS BIGINT) AS hits, CAST(total AS BIGINT) AS total, recall
       |FROM (
       |${topkTier("ivf", annIvfSql)}
       |UNION ALL
       |${topkTier("ivf_trained", annIvfTrainedSql)}
       |UNION ALL
       |$lshTier
       |UNION ALL
       |${topkTier("quantized", annQuantizedSql)}
       |) ORDER BY tier""".stripMargin
  }

  // ---- corpus preparation ------------------------------------------------

  /** Deterministic train/val/test assignment (operators.Splits): split
    * is a pure function of the doc id — reproducible across engines,
    * which is exactly what the hash check asserts.
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.assign(t(s, dir, "documents"), "doc_id")
      .orderBy("doc_id")

  val splitAssignSql: String =
    s"""SELECT doc_id,
       |  ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':graft'")} % 100 AS bucket,
       |  CASE WHEN ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':graft'")} % 100 < 80 THEN 'train'
       |       WHEN ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':graft'")} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary top-k (tokenizer-training counting pass). */
  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    TextStats.vocabulary(t(s, dir, "documents"), "text", 100)
      .orderBy(col("n").desc, col("tok").asc)

  val vocabTopKSql: String =
    s"""SELECT tok, CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT unnest(${sqlWords("text")}) AS tok FROM documents)
       |GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 100""".stripMargin

  /** Exact per-source token-length quantiles — selection by integer
    * rank, so both engines pick the identical element (approx_percentile
    * sketches are merge-order-dependent and would never hash-match).
    */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame =
    TextStats.lengthQuantiles(t(s, dir, "documents"), "doc_id", "text", "source")
      .orderBy("source")

  val lengthQuantilesSql: String =
    s"""WITH l AS (SELECT source, doc_id,
       |    CAST(len(${sqlWords("text")}) AS BIGINT) AS len FROM documents),
       |r AS (SELECT source, len,
       |    row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM l)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  max(CASE WHEN rn <= (n * 50 + 99) // 100 THEN len END) AS p50,
       |  max(CASE WHEN rn <= (n * 90 + 99) // 100 THEN len END) AS p90,
       |  max(CASE WHEN rn <= (n * 99 + 99) // 100 THEN len END) AS p99
       |FROM r GROUP BY source ORDER BY source""".stripMargin

  /** Group-wise top-k by quality (per-source best documents) — the
    * ranked-selection pattern a curation pipeline uses to sample
    * highest-quality exemplars per domain.
    */
  def qualityTopKPerSource(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(
      col("doc_id"), col("source"), Text.qualityScore(col("text")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("source"), col("doc_id"), col("rank").cast("long").as("rank"), col("score"))
      .orderBy("source", "rank")
  }

  val qualityTopKPerSourceSql: String =
    s"""WITH q AS (SELECT doc_id, source,
       |    len(${sqlWords("text")}) AS n_tok,
       |    len(list_distinct(${sqlWords("text")})) AS n_uniq,
       |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
       |    length(text) AS n_char
       |  FROM documents),
       |sc AS (SELECT doc_id, source,
       |  CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), n_tok / CAST(20.0 AS DOUBLE))
       |  + CAST(0.4 AS DOUBLE) * (n_uniq / CAST(n_tok AS DOUBLE))
       |  + CAST(0.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - n_punct / CAST(n_char AS DOUBLE)) AS score
       |  FROM q)
       |SELECT source, doc_id, rank, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY score DESC, doc_id ASC) AS rank FROM sc)
       |WHERE rank <= 3 ORDER BY source, rank""".stripMargin

  // ---- corpus preparation, continued -------------------------------------

  /** BPE merge-step primitive: global adjacent-token-pair counts, top
    * 30 under a total order. One projection (pairs emitted in place,
    * no self-join) + one map-side-combinable count — the shape a
    * tokenizer trainer iterates at corpus scale.
    */
  def bpePairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(Text.tokens(col("text")).as("w"))
      .select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', element_at(w, i + 2)))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc).limit(30)

  val bpePairsSql: String =
    s"""WITH d AS (SELECT ${sqlWords("text")} AS w FROM documents),
       |p AS (SELECT unnest(list_transform(range(1, len(w)),
       |        i -> w[i] || ' ' || w[i+1])) AS pair FROM d)
       |SELECT pair, CAST(count(*) AS BIGINT) AS n
       |FROM p GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 30""".stripMargin

  /** Fixpoint rounds for the BPE TRAINER (x_bpe_train). */
  private val BpeTrainRounds = 6

  /** The tokenizer-training fixpoint itself (TextStats.bpeTrain):
    * x_bpe_pairs counts ONE merge step; this trains [[BpeTrainRounds]]
    * merges — per round the winning adjacent pair (count desc, pair asc)
    * merges greedily left-to-right corpus-wide, and the next round
    * counts over the REWRITTEN corpus. The oracle replays the identical
    * rounds as unrolled DuckDB CTEs (the x_pagerank discipline): the
    * spaced-string representation makes each round's merge one
    * non-overlapping `replace` in both engines, so the learned merge
    * table hash-matches exactly.
    */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextStats
      .bpeTrain(t(s, dir, "documents"), "text", BpeTrainRounds)
      .orderBy("step")

  val bpeTrainSql: String = {
    val rounds = (1 to BpeTrainRounds).map { i =>
      s"""m$i AS (SELECT pair, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(list_transform(range(1, len(w)),
         |          j -> w[j] || ' ' || w[j+1])) AS pair
         |        FROM (SELECT string_split(trim(seq), '  ') AS w FROM d${i - 1}))
         |  GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 1),
         |d$i AS (SELECT replace(seq,
         |    ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
         |    ' ' || split_part(pair, ' ', 1) || chr(31) || split_part(pair, ' ', 2) || ' ') AS seq
         |  FROM d${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BpeTrainRounds)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, pair, n FROM m$i")
      .mkString("\n  UNION ALL ")
    s"""WITH d0 AS (SELECT ' ' || array_to_string(${sqlWords("text")}, '  ') || ' ' AS seq
       |  FROM documents),
       |$rounds
       |SELECT step, pair, n FROM (
       |  $out)
       |ORDER BY step""".stripMargin
  }

  /** The INFERENCE half of the tokenizer (TextStats.bpeEncode): train
    * [[BpeTrainRounds]] merges, then tokenize every document with the
    * learned table — per doc the post-merge token count and how many
    * tokens are merged pairs. The encode pass is one codegen'd
    * projection chaining one `replace` per merge (zero shuffle; the
    * merge table is tokenizer-sized driver state, like a broadcast
    * vocabulary). The oracle replays the same rounds' rewrites carrying
    * doc_id through the unrolled CTEs.
    */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val merges = graft.operators.TextStats
      .bpeTrain(docs, "text", BpeTrainRounds)
      .orderBy("step").select("pair").as[String].collect().toSeq
    graft.operators.TextStats.bpeEncode(docs, "text", merges)
      .select(col("doc_id"),
        size(col("bpe_tokens")).cast("long").as("n_tokens"),
        size(filter(col("bpe_tokens"),
          tk => tk.contains(graft.operators.TextStats.MergeSep)))
          .cast("long").as("n_merged"))
      .orderBy("doc_id")
  }

  val bpeEncodeSql: String = {
    val rounds = (1 to BpeTrainRounds).map { i =>
      s"""m$i AS (SELECT pair
         |  FROM (SELECT unnest(list_transform(range(1, len(w)),
         |          j -> w[j] || ' ' || w[j+1])) AS pair
         |        FROM (SELECT string_split(trim(seq), '  ') AS w FROM d${i - 1}))
         |  GROUP BY pair ORDER BY count(*) DESC, pair ASC LIMIT 1),
         |d$i AS (SELECT doc_id, replace(seq,
         |    ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
         |    ' ' || split_part(pair, ' ', 1) || chr(31) || split_part(pair, ' ', 2) || ' ') AS seq
         |  FROM d${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH d0 AS (SELECT doc_id,
       |    ' ' || array_to_string(${sqlWords("text")}, '  ') || ' ' AS seq
       |  FROM documents),
       |$rounds
       |SELECT doc_id,
       |  CASE WHEN trim(seq) = '' THEN CAST(0 AS BIGINT)
       |    ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT) END AS n_tokens,
       |  CASE WHEN trim(seq) = '' THEN CAST(0 AS BIGINT)
       |    ELSE CAST(len(list_filter(string_split(trim(seq), '  '),
       |      t -> contains(t, chr(31)))) AS BIGINT) END AS n_merged
       |FROM d$BpeTrainRounds ORDER BY doc_id""".stripMargin
  }

  /** Deterministic stratified sampling: per-language keep rates
    * (downsample the dominant language) decided by a pure hash of the
    * doc id — reproducible across engines/partitionings (never
    * rand()), stable under corpus growth, zero-shuffle. The rebalancing
    * pass of a data-mixing pipeline.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(40L)).otherwise(lit(90L))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .filter(pmod(
        Text.polyHash(concat(col("doc_id").cast("string"), lit(":sample"))),
        lit(100L)) < rate)
      .orderBy("doc_id")
  }

  val stratifiedSampleSql: String =
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':sample'")} % 100
       |      < CASE WHEN lang = 'en' THEN 40 ELSE 90 END
       |ORDER BY doc_id""".stripMargin

  /** Temperature-based domain mixture (operators.Splits): per-domain
    * keep rates `sqrt(n_min/n_d)` so the dominant source downsamples
    * sublinearly — the data-mixing pass of a pretraining pipeline,
    * selection by pure hash (reproducible, zero-shuffle per doc).
    */
  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Splits
      .temperatureSample(t(s, dir, "documents"), "source", "doc_id")
      .orderBy("source")

  val mixtureSampleSql: String =
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |           FROM documents GROUP BY source),
       |m AS (SELECT min(n_docs) AS n_min FROM c),
       |r AS (SELECT source, n_docs,
       |        CAST(floor(CAST(1000000.0 AS DOUBLE) *
       |          sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)))
       |          AS BIGINT) AS rate_ppm
       |      FROM c, m)
       |SELECT r.source, r.n_docs, r.rate_ppm,
       |  CAST(sum(CASE WHEN
       |      ${sqlPolyHash("CAST(d.doc_id AS VARCHAR) || ':mix'")} % 1000000
       |      < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents d JOIN r ON d.source = r.source
       |GROUP BY r.source, r.n_docs, r.rate_ppm
       |ORDER BY r.source""".stripMargin

  /** Deterministic global training-order shuffle (operators.Splits):
    * the full permutation is pinned by the meta checksum (computed
    * over EVERY position); the first 100 positions ship as content.
    */
  def shuffleOrder(s: SparkSession, dir: String): DataFrame = {
    val full = graft.operators.Splits
      .shuffleOrder(t(s, dir, "documents"), "doc_id")
    val head = full.filter(col("position") <= 100)
      .withColumn("kind", lit("content"))
      .select(col("kind"), col("position"), col("doc_id"), col("h"))
    val chk = full.agg(
      sum(col("position") * pmod(col("doc_id"), lit(97L))).as("checksum"),
      count(lit(1)).as("total")).head()
    val meta = s.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row("meta", -1L, chk.getLong(0), chk.getLong(1))),
      new org.apache.spark.sql.types.StructType()
        .add("kind", org.apache.spark.sql.types.StringType, false)
        .add("position", org.apache.spark.sql.types.LongType, false)
        .add("doc_id", org.apache.spark.sql.types.LongType, false)
        .add("h", org.apache.spark.sql.types.LongType, false))
    head.unionByName(meta).orderBy("kind", "position")
  }

  val shuffleOrderSql: String =
    s"""WITH hh AS (SELECT doc_id,
       |    ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':shuffle'")} AS h
       |  FROM documents),
       |r AS (SELECT doc_id, h,
       |    CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS position
       |  FROM hh)
       |SELECT kind, position, doc_id, h FROM (
       |  SELECT 'content' AS kind, position, doc_id, h FROM r
       |  WHERE position <= 100
       |  UNION ALL
       |  SELECT 'meta', CAST(-1 AS BIGINT),
       |    CAST(sum(position * (doc_id % 97)) AS BIGINT),
       |    CAST(count(*) AS BIGINT)
       |  FROM r
       |) ORDER BY kind, position""".stripMargin

  /** Train/test contamination scan: test-split documents sharing word
    * 3-gram shingles with any train-split document (split assignment =
    * the deterministic x_split_assign hash). Candidate generation is an
    * inverted-index equi-join on shingle hash — the scalable shape; at
    * 100× corpus, cap stop-shingle df exactly as
    * TextDedup.ngramJaccardPairsCapped does (kept exact here because
    * the oracle replays the full join).
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sp = graft.operators.Splits.assign(docs, "doc_id").select("doc_id", "split")
    val sh = docs
      .select(col("doc_id"), explode(Text.shingleHashes(col("text"), ShingleK)).as("h"))
      .join(sp, "doc_id")
    val testSh = sh.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("h"))
    val trainSh = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("h"))
    testSh.join(trainSh, "h")
      .groupBy("test_doc")
      .agg(
        countDistinct(col("h")).as("n_shared_shingles"),
        countDistinct(col("train_doc")).as("n_train_docs"))
      .orderBy("test_doc")
  }

  val contaminationSql: String =
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':graft'")} % 100 < 80 THEN 'train'
       |         WHEN ${sqlPolyHash("CAST(doc_id AS VARCHAR) || ':graft'")} % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |sh AS (SELECT doc_id,
       |    unnest(list_distinct(list_transform($sqlShingles, x -> ${sqlPolyHash("x")}))) AS h
       |  FROM (SELECT doc_id, ${sqlWords("text")} AS w FROM documents)),
       |tt AS (SELECT s1.doc_id AS test_doc, s2.doc_id AS train_doc, s1.h
       |  FROM sh s1 JOIN sp p1 ON s1.doc_id = p1.doc_id AND p1.split = 'test'
       |  JOIN sh s2 ON s1.h = s2.h
       |  JOIN sp p2 ON s2.doc_id = p2.doc_id AND p2.split = 'train')
       |SELECT test_doc,
       |  CAST(count(DISTINCT h) AS BIGINT) AS n_shared_shingles,
       |  COUNT(DISTINCT train_doc) AS n_train_docs
       |FROM tt GROUP BY test_doc ORDER BY test_doc""".stripMargin

  /** Fixed-point PageRank iterations for x_pagerank (operators/Rank). */
  private val PageRankIters = 5

  /** PageRank over the near-dup graph (edges = the x_dedup_ngram pair
    * set at 0.6, nodes = all documents): the canonical-copy chooser for
    * dedup clusters. Integer micro-unit arithmetic end to end, so the
    * five distributed iterations hash-match the oracle's five unrolled
    * SQL stages exactly (see Rank.pageRank's determinism note).
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Rank.pageRank(
        TextDedup.ngramJaccardPairs(docs, "doc_id", "text", ShingleK, 0.6),
        docs.select(col("doc_id").as("id")),
        PageRankIters)
      .select(col("id").as("doc_id"), col("rank_micro"))
      .orderBy(col("rank_micro").desc, col("doc_id").asc)
  }

  val pagerankSql: String = {
    val stages = (1 to PageRankIters).map { i =>
      s"""r$i AS (SELECT n.v, 150000 + (85 * COALESCE(s.c, 0)) // 100 AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.d AS v, CAST(SUM(p.r // dg.dg) AS BIGINT) AS c
         |    FROM e JOIN r${i - 1} p ON e.s = p.v JOIN dg ON dg.s = e.s
         |    GROUP BY e.d) s ON n.v = s.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${jaccardPairsCte(0.6)},
       |e AS (SELECT id_a AS s, id_b AS d FROM jp
       |      UNION ALL SELECT id_b, id_a FROM jp),
       |dg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY s),
       |n AS (SELECT doc_id AS v FROM documents),
       |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
       |$stages
       |SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_micro
       |FROM r$PageRankIters
       |ORDER BY rank_micro DESC, doc_id ASC""".stripMargin
  }

  // ---- sketches ----------------------------------------------------------

  private val KmvK = 256
  private val CmsD = 4
  private val CmsW = 2048

  /** Non-empty whitespace tokens with their language. */
  private def langTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)

  /** KMV approximate-distinct (plans/aggregates.scala): per-language
    * vocabulary-size estimate from the k smallest distinct token
    * hashes — the bounded-memory path where `count(DISTINCT tok)` at
    * 100 TB would shuffle the whole vocabulary. The exact count rides
    * along so the estimate's error is a measured, hash-checked number
    * every round (same auditing pattern as x_ann_recall). Estimator:
    * k_seen < k ⇒ the sketch IS the exact distinct-hash count; else
    * (k−1)·M / h_k, one double division (SURVEY §7.4).
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    langTokens(s, dir)
      .groupBy("lang")
      .agg(
        graft.plans.expressions.kMinValues(Text.polyHash(col("tok")), KmvK).as("kmin"),
        countDistinct(col("tok")).as("n_exact"))
      .select(
        col("lang"), col("n_exact"),
        size(col("kmin")).cast("long").as("k_seen"),
        try_element_at(col("kmin"), lit(KmvK)).as("h_k"),
        when(size(col("kmin")) < KmvK, size(col("kmin")).cast("double"))
          .otherwise(lit(((KmvK - 1).toLong * Text.HashMod).toDouble) /
            try_element_at(col("kmin"), lit(KmvK)))
          .as("est_distinct"))
      .orderBy("lang")

  val approxDistinctSql: String = {
    val num = (KmvK - 1).toLong * Text.HashMod
    s"""WITH tk AS (SELECT lang, tok
       |  FROM (SELECT lang, unnest(${sqlWords("text")}) AS tok FROM documents)
       |  WHERE length(tok) > 0),
       |hd AS (SELECT DISTINCT lang, ${sqlPolyHash("tok")} AS h FROM tk),
       |r AS (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hd),
       |km AS (SELECT lang, CAST(count(*) AS BIGINT) AS k_seen,
       |    max(CASE WHEN rn = $KmvK THEN h END) AS h_k
       |  FROM r WHERE rn <= $KmvK GROUP BY lang),
       |ex AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
       |  FROM tk GROUP BY lang)
       |SELECT lang, n_exact, k_seen, h_k,
       |  CASE WHEN k_seen < $KmvK THEN CAST(k_seen AS DOUBLE)
       |       ELSE CAST($num AS DOUBLE) / h_k END AS est_distinct
       |FROM ex JOIN km USING (lang) ORDER BY lang""".stripMargin
  }

  /** Count-min heavy hitters (operators/Sketches.scala): the d×w
    * sketch build is a bounded-output groupBy (shuffle = sketch size,
    * not vocabulary size); the top-20 exact counts ride along to make
    * the CMS overestimate a measured, hash-checked number. The exact
    * side is the audit, not the scale path — at 100 TB one keeps the
    * sketch and drops the exact groupBy.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = langTokens(s, dir).select("tok")
    val sketch = Sketches.countMinBuild(toks, "tok", CmsD, CmsW)
    val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
    Sketches.countMinLookup(sketch, top, "tok", CmsD, CmsW)
      .withColumn("overcount", col("est_n") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
  }

  val heavyHittersSql: String = {
    def bucket(tok: String, r: String) =
      s"${sqlPolyHash(s"$tok || ':cms' || CAST($r AS VARCHAR)")} % $CmsW"
    s"""WITH toks AS (SELECT tok
       |  FROM (SELECT unnest(${sqlWords("text")}) AS tok FROM documents)
       |  WHERE length(tok) > 0),
       |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM toks GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20),
       |cms AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT g.r, ${bucket("t.tok", "g.r")} AS bucket
       |        FROM toks t CROSS JOIN (SELECT unnest(range($CmsD)) AS r) g)
       |  GROUP BY r, bucket),
       |probe AS (SELECT top.tok, top.n_exact, min(cms.n) AS est_n
       |  FROM top CROSS JOIN (SELECT unnest(range($CmsD)) AS r) g
       |  JOIN cms ON cms.r = g.r AND cms.bucket = ${bucket("top.tok", "g.r")}
       |  GROUP BY top.tok, top.n_exact)
       |SELECT tok, n_exact, est_n, est_n - n_exact AS overcount
       |FROM probe ORDER BY n_exact DESC, tok""".stripMargin
  }

  // ---- multimodal --------------------------------------------------------

  def multimodal(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(t(s, dir, "documents")))
      .toDF()
      .select(
        col("media_id"), col("kind"), col("n_bytes"),
        col("n_frames").cast("long").as("n_frames"),
        element_at(col("feature"), 1).cast("double").as("feat0"))
      .orderBy("media_id")

  /** The stub decoder is deterministic, so even the mapPartitions path
    * is oracle-checkable: document text is ASCII, hence payload bytes ==
    * codepoints, and DuckDB can replay the byte-stride rolling-hash
    * feature (positions 1, 9, 17, … feed feature lane 0), the
    * round-robin kind, and the video frame-sampling count exactly.
    * feat0's float32 divide is replayed in FLOAT before widening.
    */
  val multimodalSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, '') AS cs, length(text) AS n
       |           FROM documents),
       |f AS (SELECT doc_id, n,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, n + 1, 8), i -> CAST(ord(cs[i]) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) AS acc0
       |  FROM w)
       |SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST(n AS BIGINT) AS n_bytes,
       |  CAST(CASE WHEN doc_id % 3 = 2 THEN (n + 63) // 64 ELSE 1 END AS BIGINT) AS n_frames,
       |  CAST(CAST(acc0 % 1000 AS FLOAT) / CAST(1000 AS FLOAT) AS DOUBLE) AS feat0
       |FROM f ORDER BY media_id""".stripMargin

  // ---- corpus LM scoring (CCNet perplexity filter + DSIR weights) -------

  /** Serving-LM prune size for x_lm_bits (generous at test SF so the
    * prune is a no-op locally; the POINT is the TakeOrderedAndProject
    * shape that keeps the scoring join's build side O(K) at 100 TB).
    */
  private val LmTopK = 50000

  /** Hashed-feature space for x_dsir_weights: count tables are
    * buckets-bounded, so they broadcast at any corpus size.
    */
  private val DsirBuckets = 4096

  /** CCNet-style LM quality gate: train an add-one bigram LM on the
    * trusted slice (lang = 'en'), score every document's whole-bit
    * surprisal (operators/LangModel.scala — exact integer log2 via bit
    * length, the x_pagerank no-floats discipline). Low
    * milli_bits_per_bigram = fluent under the trained LM; the oracle
    * replays train + prune + score as plain SQL.
    */
  def lmBits(s: SparkSession, dir: String): DataFrame =
    LangModel.surprisalBits(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", LmTopK)
      .orderBy("doc_id")

  val lmBitsSql: String = {
    val bgs = "list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])"
    s"""WITH tok AS (SELECT doc_id, lang, ${sqlWords("lower(text)")} AS w FROM documents),
       |t2 AS (SELECT * FROM tok WHERE len(w) >= 2),
       |tr AS (SELECT w FROM t2 WHERE lang = 'en'),
       |pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
       |        FROM (SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1 FROM tr)
       |        GROUP BY w1),
       |kept AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12
       |         FROM (SELECT unnest($bgs) AS bg FROM tr)
       |         GROUP BY bg ORDER BY c12 DESC, bg LIMIT $LmTopK),
       |voc AS (SELECT CAST(count(DISTINCT tkn) AS BIGINT) AS v
       |        FROM (SELECT unnest(w) AS tkn FROM tr)),
       |db AS (SELECT doc_id, unnest($bgs) AS bg FROM t2),
       |sc AS (SELECT d.doc_id,
       |         length(bin(((COALESCE(k2.c1, 0) + voc.v) * ${LangModel.ProbScale})
       |                    // (COALESCE(k.c12, 0) + 1))) AS bits
       |       FROM db d
       |       LEFT JOIN kept k ON d.bg = k.bg
       |       LEFT JOIN pre k2 ON split_part(d.bg, ' ', 1) = k2.w1
       |       CROSS JOIN voc)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(bits) AS BIGINT) AS surprisal_bits,
       |  CAST(sum(bits) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS milli_bits_per_bigram
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Batch-perceptron training rounds / feature buckets for
    * x_quality_classifier (operators/LangModel.perceptronScores).
    */
  private[queries] val PerceptronRounds = 3
  private[queries] val PerceptronBuckets = 1024

  /** Model-based quality classifier (the DCLM / FineWeb-edu family:
    * train a linear classifier, score the corpus, keep what scores
    * high) — a batch perceptron over hashed unigram counts, trained
    * INSIDE the engine with integer-exact rounds and replayed by the
    * oracle as unrolled SQL stages.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    LangModel.perceptronScores(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", PerceptronBuckets, PerceptronRounds)
      .orderBy("doc_id")

  val qualityClassifierSql: String = {
    val stages = (2 to PerceptronRounds).map { i =>
      s"""m${i - 1} AS (SELECT ft.doc_id, ft.y, CAST(SUM(w.w * ft.x) AS BIGINT) AS m
         |  FROM ft JOIN w${i - 1} w USING (f) GROUP BY ft.doc_id, ft.y),
         |u$i AS (SELECT ft.f, CAST(SUM(ft.y * ft.x) AS BIGINT) AS u
         |  FROM ft JOIN m${i - 1} mm ON ft.doc_id = mm.doc_id AND mm.y * mm.m <= 0
         |  GROUP BY ft.f),
         |w$i AS (SELECT w.f, w.w + COALESCE(u.u, 0) AS w
         |  FROM w${i - 1} w LEFT JOIN u$i u USING (f))""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (SELECT doc_id,
       |        CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |        ${sqlPolyHash("tkn")} % $PerceptronBuckets AS f
       |      FROM (SELECT doc_id, lang, unnest(${sqlWords("lower(text)")}) AS tkn
       |            FROM documents)
       |      WHERE length(tkn) > 0),
       |ft AS (SELECT doc_id, y, f, CAST(count(*) AS BIGINT) AS x
       |       FROM tk GROUP BY 1, 2, 3),
       |w1 AS (SELECT f, CAST(SUM(y * x) AS BIGINT) AS w FROM ft GROUP BY f),
       |$stages,
       |mf AS (SELECT ft.doc_id, ft.y, CAST(SUM(w.w * ft.x) AS BIGINT) AS m
       |       FROM ft JOIN w$PerceptronRounds w USING (f)
       |       GROUP BY ft.doc_id, ft.y)
       |SELECT doc_id, CAST(y AS BIGINT) AS label, m AS margin,
       |  CASE WHEN m > 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS pred
       |FROM mf ORDER BY doc_id""".stripMargin
  }

  /** DSIR importance weights (Xie et al. 2023): hashed bag-of-unigrams
    * log-likelihood ratio between the target slice (lang = 'en') and
    * the raw corpus, quantized per token to whole bits. Positive
    * weight_bits = target-like (sample up).
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    LangModel.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", DsirBuckets)
      .orderBy("doc_id")

  val dsirWeightsSql: String = {
    val s = LangModel.DsirScale
    s"""WITH tk AS (SELECT doc_id, lang = 'en' AS is_t, tkn,
       |        ${sqlPolyHash("tkn")} % $DsirBuckets AS f
       |      FROM (SELECT doc_id, lang, unnest(${sqlWords("lower(text)")}) AS tkn FROM documents)
       |      WHERE length(tkn) > 0),
       |cnt AS (SELECT f, CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |               CAST(count(*) AS BIGINT) AS cr FROM tk GROUP BY f),
       |tot AS (SELECT CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |               CAST(count(*) AS BIGINT) AS nr FROM tk),
       |sc AS (SELECT tk.doc_id,
       |         length(bin(greatest(1, ((cnt.ct + 1) * $s) // (tot.nt + $DsirBuckets))))
       |       - length(bin(greatest(1, ((cnt.cr + 1) * $s) // (tot.nr + $DsirBuckets)))) AS lr
       |       FROM tk JOIN cnt ON tk.f = cnt.f CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(lr) AS BIGINT) AS weight_bits
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("x_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("x_token_counts", tokenCounts, Some(tokenCountsSql)),
    QueryDef("x_quality_score", quality, Some(qualitySql)),
    QueryDef("x_lang_id", langId, Some(langIdSql)),
    QueryDef("x_redact", redact, Some(redactSql)),
    QueryDef("x_tfidf_topterm", tfidfTopTerm, Some(tfidfTopTermSql)),
    QueryDef("x_rare_tokens", rareTokens, Some(rareTokensSql)),
    QueryDef("x_repetition", repetition, Some(repetitionSql)),
    QueryDef("x_dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("x_dedup_substring", dedupSubstring, Some(dedupSubstringSql)),
    QueryDef("x_dedup_substring_cut", dedupSubstringCut, Some(dedupSubstringCutSql)),
    QueryDef("x_dedup_ngram", dedupNgram, Some(dedupNgramSql)),
    QueryDef("x_dedup_ngram_capped", dedupNgramCapped, Some(jaccardPairsSql(0.6))),
    QueryDef("x_dedup_components", dedupComponents, Some(dedupComponentsSql)),
    QueryDef("x_dedup_minhash", dedupMinhash, Some(dedupMinhashSql)),
    QueryDef("x_dedup_simhash", dedupSimhash, Some(dedupSimhashSql)),
    QueryDef("x_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    QueryDef("x_embed_pairs", embedPairs, Some(embedPairsSql)),
    QueryDef("x_semdedup", semDedup, Some(semDedupSql)),
    QueryDef("x_semdedup_ivf", semDedupIvf, Some(semDedupIvfSql)),
    QueryDef("x_embed_lsh", embedLsh, Some(embedLshSql)),
    QueryDef("x_ann_topk", annTopK, Some(annTopKSql)),
    QueryDef("x_ann_ivf", annIvf, Some(annIvfSql)),
    QueryDef("x_ann_ivf_trained", annIvfTrained, Some(annIvfTrainedSql)),
    QueryDef("x_ann_recall", annRecall, Some(annRecallSql)),
    QueryDef("x_ann_quantized", annQuantized, Some(annQuantizedSql)),
    QueryDef("x_multimodal", multimodal, Some(multimodalSql)),
    QueryDef("x_split_assign", splitAssign, Some(splitAssignSql)),
    QueryDef("x_vocab_topk", vocabTopK, Some(vocabTopKSql)),
    QueryDef("x_length_quantiles", lengthQuantiles, Some(lengthQuantilesSql)),
    QueryDef("x_quality_topk", qualityTopKPerSource, Some(qualityTopKPerSourceSql)),
    QueryDef("x_pagerank", pagerank, Some(pagerankSql)),
    QueryDef("x_bpe_pairs", bpePairs, Some(bpePairsSql)),
    QueryDef("x_bpe_train", bpeTrain, Some(bpeTrainSql)),
    QueryDef("x_bpe_encode", bpeEncode, Some(bpeEncodeSql)),
    QueryDef("x_lm_bits", lmBits, Some(lmBitsSql)),
    QueryDef("x_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    QueryDef("x_quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
    QueryDef("x_cluster_balance", clusterBalance, Some(clusterBalanceSql)),
    QueryDef("x_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    QueryDef("x_mixture_sample", mixtureSample, Some(mixtureSampleSql)),
    QueryDef("x_shuffle_order", shuffleOrder, Some(shuffleOrderSql)),
    QueryDef("x_contamination", contamination, Some(contaminationSql)),
    QueryDef("x_approx_distinct", approxDistinct, Some(approxDistinctSql)),
    QueryDef("x_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    QueryDef("x_expectations", expectations, Some(expectationsSql)),
    QueryDef("x_sql_surface", sqlSurface, Some(sqlSurfaceSql)),
    QueryDef("x_chunk", chunk, Some(chunkSql)),
    QueryDef("x_pack", pack, Some(packSql)),
    QueryDef("x_pack_nosplit", packNosplit, Some(packNosplitSql)),
    QueryDef("x_curate", curate, Some(curateSql)),
    QueryDef("x_curate_lsh", curateLsh, Some(curateLshSql)))
}
