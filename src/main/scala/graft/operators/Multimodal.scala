package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal columns: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-record feature
  * extraction runs as partition-local Scala (`mapPartitions`) — the JVM
  * analog of the `mapInPandas` batch-UDF pattern: one iterator per
  * partition, decoder state initialized once per partition, no
  * per-row driver involvement.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `FakeDecoder` derives deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, binary transport,
  * batching, partitioning — is real and tested; swap `FakeDecoder` for a
  * JNI/javax.imageio decoder to productionize.
  */
object Multimodal {

  /** A media record: payload + typed metadata (the schema the pipeline
    * standardizes on; flat metadata keeps parquet predicate pushdown on
    * kind/width/duration effective at scale).
    */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float],
      n_frames: Int)

  val FeatureDim = 8

  /** STUB decoder — deterministic fake in place of a real codec.
    * Features are a rolling-hash projection of the payload; "frames" are
    * fixed-stride byte windows (what frame sampling does to video).
    */
  object FakeDecoder {
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        val d = i % FeatureDim
        acc(d) = (acc(d) * 31 + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      acc.map(v => (v % 1000).toFloat / 1000f)
    }

    /** Every `stride`-th window start — video frame sampling shape. */
    def sampleFrames(bytes: Array[Byte], stride: Int): Int =
      if (bytes.isEmpty) 0 else (bytes.length + stride - 1) / stride
  }

  /** Builds a media table from the documents table (payload = utf-8 bytes
    * of the text; kind round-robins) — the fixture generator for specs
    * and the rows-only demo query.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    implicit val enc = Encoders.product[MediaRecord]
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 16).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Partition-local decode/feature-extract (batch-UDF shape): the
    * decoder is instantiated once per partition and streamed over the
    * iterator — constant memory, no shuffle, preserves partitioning.
    */
  def extractFeatures(media: Dataset[MediaRecord], frameStride: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts etc.)
      it.map { m =>
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          n_bytes = m.bytes.length.toLong,
          feature = FakeDecoder.features(m.bytes),
          n_frames = if (m.kind == "video") FakeDecoder.sampleFrames(m.bytes, frameStride) else 1)
      }
    }
  }
}
