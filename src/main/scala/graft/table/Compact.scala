package graft.table

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the engine's analog of Delta `OPTIMIZE`.
  *
  * The streaming bronze path appends one file-set per drained
  * micro-batch (reference `01_bronze_csv_to_delta.py:49-56`); at a
  * realistic drain cadence a bronze table decays into thousands of
  * KB-sized parquet files and every downstream scan pays file-listing
  * and per-file-open overhead instead of IO. `compact` rewrites the
  * table's data into ~`targetFileBytes` files, atomically
  * (Table.overwriteAtomic: readers see the old file-set or the new one,
  * never a mix) and idempotently (an already-compact table is left
  * byte-for-byte untouched).
  *
  * What compaction must NOT touch: the table's seen-files manifest
  * (`Ingest.manifestRef`, a SIBLING directory) — ingest idempotence
  * keys on the original `source_file` VALUES stored in the rows, which
  * a rewrite preserves, so checkpoint-wiped ingest replays stay no-ops
  * after compaction. Downstream parquet-tailing streams (bronze→silver)
  * see the compacted files as new and re-deliver the rows once; the
  * silver LWW upsert is idempotent, so this costs one redundant batch,
  * not correctness — compact bronze right after a silver refresh.
  *
  * Scale: the rewrite is one distributed coalesce-write of the table —
  * no shuffle (coalesce merges read-partitions in place). At 100 TB
  * you compact per bucket/partition (`compactBucketed`), bounding each
  * rewrite to one bucket's data — the same incremental-OPTIMIZE shape
  * Delta uses file-group by file-group.
  */
final case class CompactStats(filesBefore: Int, filesAfter: Int, bytesTotal: Long) {
  def skipped: Boolean = filesBefore == filesAfter
}

object Compact {

  val DefaultTargetFileBytes: Long = 128L << 20 // HDFS-block-sized files

  /** Non-hidden data files under `dir`, recursively (partitioned layouts
    * keep data one level down in `k=v/` subdirs).
    */
  private def dataFiles(spark: SparkSession, dir: Path): Seq[FileStatus] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(p: Path): Boolean =
      p.getName.startsWith(".") || p.getName.startsWith("_")
    def walk(p: Path): Seq[FileStatus] =
      fs.listStatus(p).toSeq.filterNot(s => hidden(s.getPath)).flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s)
        else Seq.empty
      }
    if (fs.exists(dir)) walk(dir) else Seq.empty
  }

  /** Compacts `ref` into ceil(tableBytes / targetFileBytes) files.
    * No-op (and no write at all) when the table already has that many
    * files or fewer.
    */
  def compact(
      spark: SparkSession,
      ref: TableRef,
      targetFileBytes: Long = DefaultTargetFileBytes): CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = ref.path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(ref.path)) {
      val partDirs = fs.listStatus(ref.path)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      require(partDirs.isEmpty,
        s"${ref.dir} is partition-discovered (${partDirs.head.getPath.getName}, ...) — " +
          "a flat rewrite would destroy the layout; use compactBucketed")
    }
    val files = dataFiles(spark, ref.path)
    val bytes = files.map(_.getLen).sum
    val want = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (files.size <= want) return CompactStats(files.size, files.size, bytes)
    Table.overwriteAtomic(Table.read(spark, ref).coalesce(want), ref)
    CompactStats(files.size, dataFiles(spark, ref.path).size, bytes)
  }

  /** Per-bucket compaction of a hash-bucketed table: each bucket
    * directory is compacted (and atomically swapped) independently, so
    * the unit of rewrite stays one bucket however large the table is.
    * Returns (bucket id → stats) for the buckets that exist.
    */
  def compactBucketed(
      spark: SparkSession,
      ref: BucketedRef,
      targetFileBytes: Long = DefaultTargetFileBytes): Map[Int, CompactStats] = {
    val root = new Path(ref.dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val buckets = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toInt).sorted
    val stats = buckets.map { b =>
      b -> compact(spark, ref.bucketDir(b), targetFileBytes)
    }.toMap
    spark.catalog.refreshByPath(ref.dir)
    stats
  }
}
