package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode/feature-extraction
  * runs as a partition-mapped batch operator (the Scala analog of a
  * Pandas-batch UDF: one iterator of rows per partition, library handles
  * amortized per-partition, vectorizable batch shape).
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): [[MediaCodec.decodeStub]] produces a deterministic fake
  * feature vector from the payload bytes. Everything around it — schema,
  * encoders, partitioning, batch iteration — is real and tested, so a
  * real decoder drops in by replacing one function.
  */
object Multimodal {

  /** A multimodal asset: opaque payload + typed metadata. */
  final case class MediaAsset(asset_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int, duration_ms: Long)

  /** Extracted features: fixed-width vector + the dims a real decoder
    * would emit.
    */
  final case class MediaFeatures(asset_id: Long, media_type: String,
      byte_len: Long, frames_sampled: Int, out_width: Int, out_height: Int,
      feature: Array[Float])

  object MediaCodec {
    /** STUB decode: a real build calls the image/audio codec here. The
      * fake is a GOLDEN vector, replayable by an independent engine:
      * slot `s` is the 60-bit prefix of `md5(payload ++ ('a'+s))`,
      * reduced mod 1024 and scaled into [0,1). Every value lands on a
      * 1/1024 grid — a dyadic rational, exactly representable in both
      * float32 and float64 — so the vector round-trips bit-identically
      * through parquet and the DuckDB oracle (q32 verifies the full
      * vector end-to-end, not just the metadata).
      */
    def decodeStub(payload: Array[Byte], slots: Int = 8): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(slots) { s =>
        md.reset()
        md.update(payload)
        md.update(('a' + s).toByte)
        val hex = md.digest().take(8).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex.take(15), 16) % 1024L) / 1024.0f
      }
    }

    /** Frame-sampling plan a video decoder would follow: one frame per
      * 1000ms, at least 1.
      */
    def framesToSample(durationMs: Long): Int =
      math.max(1, (durationMs / 1000L).toInt)

    /** Resize plan: aspect-preserving fit into maxDim × maxDim (the
      * geometry a real image resize would apply; the pixel work itself
      * lives behind the stubbed decode).
      */
    def resizePlan(width: Int, height: Int, maxDim: Int = 224): (Int, Int) = {
      if (width <= 0 || height <= 0) (maxDim, maxDim)
      else if (width >= height)
        (maxDim, math.max(1, math.round(height.toDouble * maxDim / width).toInt))
      else
        (math.max(1, math.round(width.toDouble * maxDim / height).toInt), maxDim)
    }
  }

  /** Build a typed asset table from the `documents` fixture (text bytes
    * stand in for media payloads; metadata derived deterministically).
    */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))
      .as[MediaAsset]
  }

  /** The partition-mapped decode operator: batch shape = one partition
    * iterator, exactly how a vectorized UDF would consume it. No shuffle;
    * scales with input splits.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val (w, h) = MediaCodec.resizePlan(a.width, a.height)
        MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
          MediaCodec.framesToSample(a.duration_ms), w, h,
          MediaCodec.decodeStub(a.payload))
      }
    }
  }
}
