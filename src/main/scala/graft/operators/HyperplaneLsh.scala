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

  /** (id, band, key) — one row per (vector, band); `key` packs the
    * band's r sign bits into a long.
    */
  private def banded(p: DataFrame, signs: Array[Array[Double]], r: Int): DataFrame = {
    val nbits = signs.length
    require(nbits % r == 0, s"r=$r must divide nbits=$nbits")
    val bits = signs.indices.map { k =>
      val h = typedLit(signs(k).toSeq)
      when(Vectors.dot(col("v"), h) > 0, lit(1L)).otherwise(lit(0L)).as(s"bit_$k")
    }
    val bandKeys = (0 until nbits / r).map { b =>
      (0 until r).map(i => col(s"bit_${b * r + i}") * lit(1L << i)).reduce(_ + _).as(s"band_$b")
    }
    p.select(col("id") +: bits: _*)
      .select(col("id") +: bandKeys: _*)
      .select(col("id"), posexplode(array((0 until nbits / r).map(b => col(s"band_$b")): _*)))
      .toDF("id", "band", "key")
  }

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
      r: Int = 8): DataFrame = {
    val p = Similarity.prepared(emb, idCol, vecCol)
    val signs = signMatrix(nbits, dim)

    val bd = banded(p, signs, r)
    val candA = bd.select(col("id").as("id_a"), col("band"), col("key"))
    val candB = bd.select(col("id").as("id_b"), col("band"), col("key"))
    val cands = candA.join(candB, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val sides = p.select(col("id"), col("v"), col("nrm"))
    cands
      .join(sides.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(sides.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
