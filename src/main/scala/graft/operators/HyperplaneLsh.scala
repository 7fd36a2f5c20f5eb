package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.{Text, Vectors}

/** Signed-random-projection (hyperplane) LSH for embedding near-dup
  * detection — the 100 TB companion to Similarity.bruteForcePairs.
  *
  * Signature bit k is `sign(v · h_k)` where hyperplane `h_k` has
  * deterministic ±1 components derived from the portable polynomial
  * hash (`sign(k,d) = +1 iff polyHash("k:d") is even`). Bits are
  * banded `r` per band; vectors colliding on any band become candidate
  * pairs (equi-join on the band key — never an all-pairs join) and are
  * verified with the exact cosine. Collision probability per bit is
  * `1 − θ/π`, so recall is tunable via (r, bands) for the near-dup
  * regime (cos ≳ 0.9); at loose thresholds over near-orthogonal data
  * hyperplane LSH cannot prune (p → 0.5) and the exact blocked
  * all-pairs operator is the right tool.
  *
  * Determinism contract: the sign matrix is a pure function of
  * (nbits, dim) computed once at plan-build time (`signMatrix`), so the
  * DuckDB oracle embeds the *same* constants and reproduces candidate
  * generation and verification exactly — the oracle checks the
  * distributed implementation of the algorithm, not a different
  * algorithm.
  */
object HyperplaneLsh {

  /** ±1 hyperplane components: signs(k)(d) for bit k, dimension d.
    * `polyHash("k:d") % 2 == 0 → +1` — portable to any engine with the
    * polynomial hash (the same fold DuckDB runs in the oracle SQL).
    */
  def signMatrix(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim) { (k, d) =>
      if (hashStr(s"$k:$d") % 2 == 0) 1.0 else -1.0
    }

  private def hashStr(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * Text.HashBase + ch.toLong) % Text.HashMod)

  /** (id, v, nrm, sig, band, key) — one row per (vector, band). The
    * FULL signature packs all `nbits ≤ 64` sign bits into ONE long
    * (`sig`); a band's join key is an r-bit slice of it
    * (`sig >>> band·r & mask`). Everything the collision pass needs —
    * first-matching-band dedup (xor + shift arithmetic on two longs)
    * and exact-cosine verification (v, nrm ride along) — is then plain
    * codegen arithmetic on the joined row: no array allocation, no
    * further join. The bit/band/key VALUES are identical to the
    * documented banding (bit k of `sig` is `sign(v·h_k)`, band b's key
    * packs bits b·r..b·r+r−1 little-endian), so the oracle replay is
    * unchanged.
    */
  private def banded(p: DataFrame, signs: Array[Array[Double]], r: Int): DataFrame = {
    val nbits = signs.length
    require(nbits % r == 0, s"r=$r must divide nbits=$nbits")
    require(nbits <= 64, s"nbits=$nbits must fit one packed long")
    val bits = signs.indices.map { k =>
      val h = typedLit(signs(k).toSeq)
      when(Vectors.dot(col("v"), h) > 0, lit(1L)).otherwise(lit(0L)).as(s"bit_$k")
    }
    val sig = signs.indices
      .map(k => shiftleft(col(s"bit_$k"), k))
      .reduce(_.bitwiseOR(_))
    // checkpoint the PER-VECTOR signature frame (one row per vector)
    // before the band explode: `cosinePairs` self-joins the banded
    // frame, and Spark shares nothing across self-join sides — without
    // this the `nbits` hyperplane dot products per vector run once per
    // side (the minhash/simhash signature-cache pattern; the cheap band
    // explode below still runs per side, which is fine).
    // NB localCheckpoint blocks are NON-REPLICATED: on a cluster with
    // executor loss or dynamic allocation the frame is unrecoverable
    // (and the eager checkpoint runs jobs at frame-BUILD time). That is
    // fine under the local[N] driver contract this operator is measured
    // on; a cluster deployment should swap in reliable checkpoint() or
    // persist(DISK_ONLY_2) at this boundary.
    p.select(Seq(col("id"), col("v"), col("nrm")) ++ bits: _*)
      .select(col("id"), col("v"), col("nrm"), sig.as("sig"))
      .localCheckpoint()
      .select(col("id"), col("v"), col("nrm"), col("sig"),
        posexplode(array((0 until nbits / r).map(b =>
          bandSlice(col("sig"), b, r)): _*)).as(Seq("band", "key")))
  }

  /** r-bit band slice `b` of a packed signature (unsigned shift — bit
    * 63 must not sign-extend into higher bands' keys). The mask is
    * `-1L >>> (64 - r)`, NOT `(1L << r) - 1`: Scala shifts are mod 64,
    * so the latter is 0 at the legal single-band r = 64 configuration
    * and would map every signature to key 0 (one all-pairs bucket).
    */
  private def bandSlice(sig: org.apache.spark.sql.Column, b: Int, r: Int) =
    shiftrightunsigned(sig, b * r).bitwiseAND(lit(-1L >>> (64 - r)))

  /** Near-dup pairs (id_a < id_b, cos ≥ threshold restricted to LSH
    * candidates): banding on `nbits` hyperplane bits, `r` per band,
    * exact cosine verification on colliding pairs only. `dim` is the
    * embedding dimensionality — a schema-level constant passed in rather
    * than probed with a driver-side action.
    */
  def cosinePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nbits: Int = 64,
      r: Int = 8,
      blocks: Int = 16): DataFrame = {
    val p = Similarity.prepared(emb, idCol, vecCol)
    val signs = signMatrix(nbits, dim)
    val spark = emb.sparkSession
    import spark.implicits._

    // Candidate generation is a SELF-JOIN on the band key, and a bucket
    // of b members emits b²/2 candidates — quadratic IN THE BUCKET. On
    // clustered data (the regime LSH exists for!) buckets are big:
    // measured at sf1 this corpus puts over a third of its vectors in
    // one band bucket, the raw per-band collision count reaches ~5·10⁸,
    // and the original plan (plain equi-join → distinct over the pair
    // stream → two verification joins) both computed the expansion in
    // as few tasks as the scan had partitions AND shuffled the half-
    // billion-row candidate stream twice — 188× the sf0.1 wall time for
    // 10× data. The scale shape has three ingredients, all preserving
    // the output bit-for-bit:
    //
    //  - BLOCK-SALT the bucket join (bruteForcePairs' technique): ids
    //    hash into `blocks` sub-blocks, a broadcast block-pair table
    //    drives slab assignment, and the join key (band, key, blk_b)
    //    spreads one bucket over blocks²/2 tasks — per-task work is
    //    bounded by (bucket/blocks)², never the whole bucket;
    //  - dedup by FIRST MATCHING BAND, not distinct: both sides carry
    //    their full band-key signature, and a collision survives only
    //    in the band where the signatures FIRST agree — each pair is
    //    emitted exactly once by construction, so the half-billion-row
    //    distinct shuffle disappears entirely;
    //  - verify IN-STAGE: vectors and norms ride the banded rows, so
    //    the exact-cosine check fuses into the same codegen stage as
    //    the slab join and only threshold survivors ever leave it. The
    //    shuffled volume is the banded corpus (linear in n, ~blocks/2×
    //    replicated on one side), not the quadratic candidate stream.
    val blockPairs = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
      .toDF("blk_a", "blk_b")
    val bd = banded(p, signs, r)
    val candA = bd.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"), col("sig").as("sig_a"), col("band"), col("key"),
      pmod(hash(col("id")), lit(blocks)).as("blk_a"))
    val candB = bd.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"), col("sig").as("sig_b"), col("band"), col("key"),
      pmod(hash(col("id")), lit(blocks)).as("blk_b"))
    candA.join(broadcast(blockPairs), Seq("blk_a"))
      .join(candB, Seq("band", "key", "blk_b"))
      // cross-block slabs see each pair once (either orientation);
      // same-block slabs see both — keep one
      .filter(col("blk_a") < col("blk_b") || col("id_a") < col("id_b"))
      // exactly-once emit: keep the collision only in the FIRST band
      // where the two signatures agree. Pure xor/shift arithmetic on
      // the two packed longs — this predicate runs on every raw
      // collision (quadratic in bucket size), so it must cost ALU ops,
      // not allocations: a band matches iff its r-bit slice of
      // sig_a^sig_b is zero, and coalesce picks the first.
      .withColumn("__xor", col("sig_a").bitwiseXOR(col("sig_b")))
      .filter(coalesce(
        ((0 until nbits / r).map(b =>
          when(bandSlice(col("__xor"), b, r) === 0, lit(b.toLong)))): _*)
        === col("band"))
      .withColumn("cos", Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("cos"))
  }
}
