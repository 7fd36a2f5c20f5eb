package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Upsert
import graft.table.{Table, TableRef}

/** Streaming ingestion — the reference's EP1 entry shape
  * (`01_bronze_csv_to_delta.py`) on OSS Structured Streaming:
  * file-source CSV scan (S1) with pinned schema, ingestion metadata
  * stamping (S3), `foreachBatch` sink (S9) running an idempotent
  * insert-only merge (M1) into the bronze table, per-stream checkpoint
  * (S10), `Trigger.AvailableNow` drain-and-stop (S11/S12).
  *
  * Exactly-once story, same as the reference: the checkpoint makes each
  * *file* enter at most one batch across restarts, and the M1 merge on
  * `source_file` makes re-delivered files no-ops — so replays after a
  * checkpoint wipe are still safe.
  */
object Ingest {

  /** Streaming CSV source with ingestion metadata (01:33-44). The
    * reference infers schemas via Auto Loader; we pin them — inference
    * is nondeterministic across runs (SURVEY.md §1.3).
    */
  def csvStream(spark: SparkSession, srcDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(srcDir)
      .withColumn("ingestion_ts", current_timestamp())
      .withColumn("source_file", col("_metadata.file_path"))

  /** Runs any micro-batch function under availableNow + checkpoint
    * (S9-S12) and blocks until the drain completes.
    */
  def runAvailableNow(stream: DataFrame, checkpoint: String)(
      fn: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** EP1 end-to-end: CSV dir → bronze table, file-level idempotent
    * (01:46-77). Returns after the available input is drained.
    */
  def csvToBronze(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      bronze: TableRef,
      checkpoint: String): Unit =
    runAvailableNow(csvStream(spark, srcDir, schema), checkpoint) { (batch, _) =>
      if (!batch.isEmpty) { // P11 batch guard (02:30-31)
        if (!Table.exists(spark, bronze)) {
          Table.overwriteAtomic(batch, bronze)
        } else {
          // M1: append only rows from files the table has not seen.
          val target = Table.read(spark, bronze)
          Table.append(Upsert.newRows(target, batch, Seq("source_file")), bronze)
        }
      }
    }

  /** Incremental silver refresh: tails the bronze table as a stream
    * (S5) and applies cleanse + LWW upsert per micro-batch — the
    * reference's `02:20-101` shape, parameterized by the entity builder.
    */
  def bronzeToSilver(
      spark: SparkSession,
      bronze: TableRef,
      bronzeSchema: StructType,
      silver: TableRef,
      checkpoint: String,
      keys: Seq[String],
      cleanse: DataFrame => DataFrame): Unit = {
    val stream = spark.readStream.schema(bronzeSchema).parquet(bronze.dir)
    runAvailableNow(stream, checkpoint) { (batch, _) =>
      if (!batch.isEmpty) {
        graft.pipeline.Silver.upsertInto(spark, silver, cleanse(batch), keys)
      }
    }
  }
}
