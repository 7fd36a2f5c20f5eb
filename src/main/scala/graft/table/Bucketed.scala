package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.Upsert

/** Hash-bucket-partitioned table: the scale-path upsert target.
  *
  * `Silver.upsertInto` (the faithful port of the reference's Delta
  * MERGE) rewrites the whole target per batch — Delta's file pruning is
  * what it loses (SURVEY.md §4). This layout restores pruning at
  * *bucket* granularity: rows live under `bucket=NNN/` subdirectories
  * keyed by `pmod(hash(keys), numBuckets)`, and an upsert
  *
  *   1. computes the source's touched bucket ids (≤ numBuckets values —
  *      a bounded driver-side collect, the analog of Delta reading its
  *      log, NOT a data-sized action),
  *   2. merges and atomically swaps ONLY those bucket directories.
  *
  * Untouched buckets are never read, never rewritten. Per-batch cost is
  * `O(touched buckets × bucket size + source)` instead of `O(table)`;
  * with numBuckets sized so a bucket ≈ a few GB, a point-update batch
  * at 100 TB rewrites a handful of buckets, not the table. Commit
  * granularity is per-bucket (each bucket swap is atomic; a crash
  * between buckets leaves earlier buckets committed — the same
  * at-least-once story as the bronze manifest, and re-running the same
  * source batch converges because LWW merge is idempotent).
  */
final case class BucketedRef(dir: String, numBuckets: Int, keys: Seq[String]) {
  require(numBuckets > 0, "numBuckets must be positive")

  def bucketCol: Column = pmod(hash(keys.map(col): _*), lit(numBuckets))
  def bucketDir(b: Int): TableRef = TableRef(s"$dir/bucket=$b")
}

object Bucketed {

  /** Existence probe, bucket-table analog of Table.exists. */
  def exists(spark: SparkSession, ref: BucketedRef): Boolean = {
    val p = new Path(ref.dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Initial materialization: one distributed write, partitioned into
    * `bucket=NNN/` dirs, atomically swapped into place.
    */
  def create(df: DataFrame, ref: BucketedRef): Unit = {
    val spark = df.sparkSession
    val root = new Path(ref.dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root.getParent, s".${root.getName}.__tmp__")
    f.delete(tmp, true)
    df.withColumn("bucket", ref.bucketCol)
      .write.partitionBy("bucket").parquet(tmp.toString)
    f.delete(new Path(ref.dir), true)
    if (!f.rename(tmp, new Path(ref.dir)))
      throw new IllegalStateException(s"rename $tmp -> ${ref.dir} failed")
    spark.catalog.refreshByPath(ref.dir)
  }

  /** Full logical view (partition column dropped). */
  def read(spark: SparkSession, ref: BucketedRef): DataFrame =
    spark.read.parquet(ref.dir).drop("bucket")

  /** LWW upsert rewriting only the buckets the source touches. */
  def upsertLww(
      spark: SparkSession,
      ref: BucketedRef,
      source: DataFrame,
      versionCol: String): Unit = {
    val src = source.withColumn("bucket", ref.bucketCol)
    val touched = src.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by numBuckets
    val f = new Path(ref.dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val slice = source.filter(ref.bucketCol === b)
      val tgtRef = ref.bucketDir(b)
      if (!f.exists(tgtRef.path) || f.listStatus(tgtRef.path).isEmpty) {
        Table.overwriteAtomic(slice, tgtRef)
      } else {
        val target = spark.read.parquet(tgtRef.dir).select(source.columns.map(col): _*)
        Table.overwriteAtomic(
          Upsert.lastWriterWins(target, slice, ref.keys, versionCol), tgtRef)
      }
    }
    // readers scan the table ROOT; invalidate its cached file index too
    spark.catalog.refreshByPath(ref.dir)
  }
}
