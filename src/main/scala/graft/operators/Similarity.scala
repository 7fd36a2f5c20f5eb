package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Vectors

/** Similarity search over embedding columns (`array<float>`).
  *
  * Three tiers:
  *   - `bruteForcePairs` / `bruteForceTopK`: exact cosine, O(n·m). The
  *     correctness baseline (oracle-checkable); m is either the corpus
  *     (pairs) or a small query set (top-k — broadcast the queries, so
  *     the big side streams with no shuffle).
  *   - `ivfTopK`: IVF-style two-level search — assign vectors to the
  *     nearest of `nlist` deterministic centroids (one broadcast join),
  *     probe the `nprobe` best centroids per query. With nprobe = nlist
  *     it degrades to exact brute force (the unit tests exploit that).
  *     This is the 100 TB path: candidate scans touch ~nprobe/nlist of
  *     the corpus, and the corpus side is partitioned by centroid.
  *
  * All cosine arithmetic is double, accumulated left-to-right
  * (graft.functions.Vectors), bit-reproducible in the DuckDB oracle.
  */
object Similarity {

  /** Projects (id, vec double[], norm double); norms computed once. */
  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  private def dotCols(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** All pairs (id_a < id_b) with cosine ≥ threshold, exact. O(n²) —
    * use for modest n or as the verification stage after blocking.
    */
  def bruteForcePairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val p = prepared(emb, idCol, vecCol)
    val a = p.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = p.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dotCols(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * The query side is broadcast; the corpus streams through one stage.
    */
  def bruteForceTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = prepared(emb, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_n"))
    val scored = c.join(broadcast(q), col("id") =!= col("q_id"))
      .withColumn("cos", dotCols(col("v"), col("q_v")) / (col("nrm") * col("q_n")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("vec_id"), col("rank").cast("long").as("rank"), col("cos"))
  }

  /** IVF(-flat) approximate top-k: deterministic centroids (every
    * `stride`-th vector by id, `nlist` of them), inverted lists built by
    * nearest-centroid assignment, queries probe their `nprobe` closest
    * centroids' lists. Exact within probed lists.
    */
  def ivfTopK(
      emb: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    val p = prepared(emb, idCol, vecCol)
    // Deterministic codebook: the nlist lowest-id vectors. (A trained
    // k-means codebook drops in here unchanged; selection is a driver-side
    // small sort, the rest of the pipeline is broadcast joins.)
    val centroids = p.orderBy(col("id")).limit(nlist)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_n"))

    def assign(side: DataFrame, vCol: String, nCol: String, take: Int) = {
      val scored = side.join(broadcast(centroids), expr("true"))
        .withColumn("c_cos", dotCols(col(vCol), col("c_v")) / (col(nCol) * col("c_n")))
      val ww = Window.partitionBy(col("id")).orderBy(col("c_cos").desc, col("c_id").asc)
      scored.withColumn("crank", row_number().over(ww))
        .filter(col("crank") <= take)
        .drop("c_v", "c_n", "c_cos", "crank")
    }

    val lists = assign(p, "v", "nrm", 1)
      .select(col("id"), col("v"), col("nrm"), col("c_id"))
    val qs = assign(prepared(queries, idCol, vecCol), "v", "nrm", nprobe)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_n"), col("c_id"))

    val scored = lists.join(broadcast(qs), Seq("c_id"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cos", dotCols(col("v"), col("q_v")) / (col("nrm") * col("q_n")))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("vec_id"), col("rank").cast("long").as("rank"), col("cos"))
  }
}
