package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.functions.Text
import graft.operators.{Curation, TextDedup, TextStats}

/** Per-stage wall-time profile of the curation pipeline
  * (graft.operators.Curation) — the bench's largest single line item.
  * Mirrors `Curation.curate`'s exact stage structure (same thresholds,
  * same localCheckpoint boundary) and forces each stage separately, so
  * the numbers attribute the pipeline's cost to scoring+filter, capped
  * pair generation, connected components, and the representative join.
  * Results are recorded in BASELINE.md; run with
  * `SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.ProfileCurate'`.
  */
object ProfileCurate {

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[curate-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val th = Curation.Thresholds()
    val docs = queries.Tables.t(spark, sfDir, "documents")
    val idCol = "doc_id"; val textCol = "text"

    // stage 1 — scoring + language/quality/repetition filter, forced at
    // the same localCheckpoint boundary curate() uses
    val kept = timed("score+filter (checkpoint)") {
      docs.select(
        col(idCol), col(textCol),
        Text.langId(col(textCol)).as("lang_pred"),
        Text.qualityScore(col(textCol)).as("score"),
        TextStats.repetitionScore(col(textCol)).as("repetition"))
        .filter(col("lang_pred") === th.lang &&
          col("score") >= th.minQuality &&
          col("repetition") <= th.maxRepetition)
        .localCheckpoint()
    }

    // stage 2 — df-capped near-dup candidate generation + exact verify
    val pairs = timed("capped pair gen (count)") {
      val p = TextDedup.ngramJaccardPairsCapped(
        kept.select(col(idCol), col(textCol)), idCol, textCol,
        th.shingleK, th.jaccard, th.maxShingleFreq)
      p.count()
      p
    }

    // stage 3 — connected components over the pairs
    val comps = timed("connected components") {
      val c = TextDedup.connectedComponents(kept, idCol, pairs)
      c.count()
      c
    }

    // stage 4 — representative-per-cluster join
    timed("representative join") {
      kept.join(comps, Seq(idCol))
        .filter(col(idCol) === col("component"))
        .select(col(idCol), col("lang_pred"), col("score"), col("repetition"))
        .count()
    }

    // the whole pipeline, uninstrumented, for cross-checking the sum
    timed("curate() end-to-end") {
      Curation.curate(docs, idCol, textCol, th).count()
    }
    spark.stop()
  }
}
