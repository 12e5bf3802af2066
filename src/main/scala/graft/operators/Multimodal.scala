package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus a feature-extract
  * stage shaped like a real decode pipeline (partition-wise batch
  * processing over a typed Dataset).
  *
  * STUB: `decodeFeatures` is where a real deployment would invoke an
  * image/audio decoder — those libraries are not in this container, so it
  * computes a deterministic 16-bin byte histogram instead. Everything
  * around it (schema, Dataset encoders, mapPartitions batching, partition
  * alignment, metadata passthrough) is the real Spark-side contract.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, format: String)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long, features: Array[Double])

  /** Model documents as media blobs (payload = UTF-8 bytes) so the binary
    * plumbing is exercised on the driver testdata. */
  def fromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    t(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          col("source").as("format")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation would decode pixels/samples here. */
  def decodeFeatures(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** Partition-wise feature extraction: one decoder init per partition
    * (the `it =>` prelude is where codec/model handles would be opened),
    * then streaming batch decode — the mapInPandas/mapPartitions shape. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder initialization would go here
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, decodeFeatures(r.payload))
      }
    }
  }

  /** Frame/chunk sampling: every Nth fixed-size window of the payload —
    * the video-frame-sample shape (binary slicing, no decode). */
  def frameSample(ds: Dataset[MediaRecord], chunkBytes: Int, everyN: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(chunkBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 =>
          (r.media_id, idx.toLong, chunk)
      }
    }.toDF("media_id", "chunk_idx", "chunk")
  }

  /** Checkable projection: the features vector is serialized to one string
    * column (the driver's rows-only pandas compare cannot sort array
    * cells). The typed Dataset from [[extractFeatures]] stays the API. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    extractFeatures(fromDocuments(s, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        expr("array_join(transform(features, x -> cast(x as string)), ',')")
          .as("features"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _))
}
