package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference to a parquet-backed table directory.
  *
  * Replaces the Delta Lake storage primitives the reference relies on
  * (create-if-missing probe `01_bronze_csv_to_delta.py:48`, batch read
  * `02_bronze_to_silver.py:394-398`, append `01:49-56`, overwrite
  * `02:543-550`) with a plain-parquet table layer. No transaction log:
  * atomicity comes from write-to-temp + directory rename, which is a
  * single metadata operation on HDFS-like filesystems (and close enough
  * on local FS for a single writer).
  */
final case class TableRef(dir: String) {
  def path: Path = new Path(dir)
}

object Table {

  private def fs(spark: SparkSession, ref: TableRef) =
    ref.path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Existence probe — stands in for `DeltaTable.isDeltaTable`
    * (reference `01:48`, `02:55` and 11 more sites): a table exists iff
    * its directory holds a `_SUCCESS` marker from a completed write.
    */
  def exists(spark: SparkSession, ref: TableRef): Boolean =
    fs(spark, ref).exists(new Path(ref.path, "_SUCCESS"))

  /** Batch scan (reference `spark.read.format("delta").load`, `02:394`). */
  def read(spark: SparkSession, ref: TableRef): DataFrame =
    spark.read.parquet(ref.dir)

  /** Batch scan with parquet schema merging — for tables whose schema
    * has widened over time (bronze under schema evolution, S1/§1.3):
    * files written before a column existed surface it as NULL.
    */
  def readMerged(spark: SparkSession, ref: TableRef): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(ref.dir)

  /** Append (reference first-time bronze materialization, `01:49-56`). */
  def append(df: DataFrame, ref: TableRef): Unit =
    df.write.mode("append").parquet(ref.dir)

  /** Full-refresh overwrite with atomic swap (reference `02:543-550`,
    * `03:53-58`, etc. — Delta gave this via log commit; we write the new
    * version to a staging dir first so the source plan can safely read
    * the *current* table contents, then swap directories.
    *
    * Staging dirs are DOT-PREFIXED siblings (`.<name>.__tmp__`):
    * Spark/Hadoop file listing and partition discovery skip hidden
    * paths, so a crash mid-swap can never make stale staging data
    * visible to readers — critical when the target is a partition
    * subdirectory of a discovered table (graft.table.Bucketed), where a
    * bare `<name>.__old__` sibling would be parsed as another partition.
    *
    * At cluster scale the swap is one namenode rename per commit; the
    * data write itself is fully distributed.
    */
  def overwriteAtomic(df: DataFrame, ref: TableRef): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, ref)
    val parent = ref.path.getParent
    val name = ref.path.getName
    val tmp = new Path(parent, s".$name.__tmp__")
    val old = new Path(parent, s".$name.__old__")
    f.delete(tmp, true)
    f.delete(old, true)
    // Materializes the plan (which may read ref.dir) before any swap.
    df.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(ref.path)) {
      if (!f.rename(ref.path, old))
        throw new IllegalStateException(s"rename ${ref.dir} -> $old failed")
    }
    if (!f.rename(tmp, ref.path)) {
      // Roll back so readers still see the previous version.
      if (f.exists(old)) f.rename(old, ref.path)
      throw new IllegalStateException(s"rename $tmp -> ${ref.dir} failed")
    }
    f.delete(old, true)
    // drop any cached file listing/plan for this path — a long-lived
    // session (or a registered temp view) would otherwise keep reading
    // the pre-swap file names and fail with FILE_NOT_EXIST
    spark.catalog.refreshByPath(ref.dir)
  }
}
