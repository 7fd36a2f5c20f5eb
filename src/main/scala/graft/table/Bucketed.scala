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

  /** Migration guard: refuses to upsert into a legacy FLAT table dir.
    * A pre-bucketing silver table holds root-level parquet files; a
    * bucketed write on top would mix them with `bucket=N/` partition
    * dirs, breaking partition discovery or duplicating rows on read.
    * Failing loudly here turns a silent data corruption into a clear
    * one-time migration step (read the flat table, `create` it
    * bucketed).
    */
  def assertBucketedLayout(spark: SparkSession, ref: BucketedRef): Unit = {
    val root = new Path(ref.dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(root)) {
      val flat = f.listStatus(root).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName)
      require(flat.isEmpty,
        s"${ref.dir} holds a legacy FLAT table layout (root-level parquet: " +
          s"${flat.take(3).mkString(", ")}${if (flat.size > 3) ", …" else ""}); " +
          "migrate it first — read the flat table and Bucketed.create it — " +
          "before bucketed upserts")
    }
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

  /** LWW upsert rewriting only the buckets the source touches.
    *
    * The source PLAN (often a whole cleanse pipeline) executes exactly
    * once: it is staged to a bucket-partitioned parquet directory in one
    * distributed write, touched bucket ids come from the staging
    * listing (bounded by numBuckets — the Delta-log-read analog, not a
    * data-sized action), and each per-bucket merge reads its
    * partition-pruned slice of the staging dir. Without the staging
    * step every per-bucket merge would re-execute the source plan —
    * O(touched buckets × source cost) instead of O(source).
    */
  def upsertLww(
      spark: SparkSession,
      ref: BucketedRef,
      source: DataFrame,
      versionCol: String): Unit = {
    assertBucketedLayout(spark, ref)
    val root = new Path(ref.dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // dot-prefixed so partition discovery on the parent never sees it;
    // UUID-suffixed so two concurrent upserts into the same table can't
    // clobber each other's staged input — racing callers now collide
    // only at the per-bucket atomic swap (loud), never at staging
    val staging = new Path(root.getParent,
      s".${root.getName}.__stage__${java.util.UUID.randomUUID().toString}")
    try {
      source.withColumn("bucket", ref.bucketCol)
        .write.partitionBy("bucket").parquet(staging.toString)
      val touched = f.listStatus(staging).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toInt).sorted
      if (touched.nonEmpty) {
        val staged = spark.read.parquet(staging.toString)
        touched.foreach { b =>
          val slice = staged.filter(col("bucket") === b)
            .select(source.columns.map(col): _*)
          val tgtRef = ref.bucketDir(b)
          if (!f.exists(tgtRef.path) || f.listStatus(tgtRef.path).isEmpty) {
            Table.overwriteAtomic(slice, tgtRef)
          } else {
            val target = spark.read.parquet(tgtRef.dir).select(source.columns.map(col): _*)
            Table.overwriteAtomic(
              Upsert.lastWriterWins(target, slice, ref.keys, versionCol), tgtRef)
          }
        }
      }
    } finally f.delete(staging, true)
    // readers scan the table ROOT; invalidate its cached file index too
    spark.catalog.refreshByPath(ref.dir)
  }
}
