package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode/feature-extraction
  * runs as a partition-mapped batch operator (the Scala analog of a
  * Pandas-batch UDF: one iterator of rows per partition, library handles
  * amortized per-partition, vectorizable batch shape).
  *
  * Codec status: PPM (netpbm P6) decode is REAL —
  * [[MediaCodec.decodePpm]] is a wire-format parser on q90's hot path,
  * oracle-verified end to end. Formats that need external libraries
  * (JPEG/PNG/audio) still enter through [[MediaCodec.decodeStub]] (a
  * deterministic golden vector) until those codecs exist in the
  * environment; the surrounding plumbing — schema, encoders,
  * partitioning, batch iteration — is shared and identical either way.
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

  /** A decoded raster: RGB bytes, row-major, 3 bytes per pixel. */
  final case class RawImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  object MediaCodec {

    /** Encode an RGB raster as binary PPM (netpbm P6) — the simplest
      * real image format, and the one format a JVM can emit with no
      * codec library.
      */
    def encodePpm(img: RawImage): Array[Byte] = {
      require(img.pixels.length == img.width * img.height * 3,
        s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}x3")
      val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ img.pixels
    }

    /** REAL image decode: binary PPM (P6) per the netpbm spec — magic,
      * then whitespace-separated width/height/maxval with `#` comments
      * allowed anywhere in the header, one whitespace byte, then
      * width×height×3 raw sample bytes. This is an actual wire-format
      * parser (the q90 payloads round-trip through it), not a stub —
      * formats that need external codecs (JPEG/PNG/audio) still enter
      * through [[decodeStub]] until their libraries exist in the
      * environment.
      */
    def decodePpm(bytes: Array[Byte]): RawImage = {
      var i = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"bad PPM at byte $i: $msg")
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWsAndComments(): Unit = {
        var more = true
        while (more) {
          while (i < bytes.length && isWs(bytes(i))) i += 1
          if (i < bytes.length && bytes(i) == '#') {
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else more = false
        }
      }
      def int(): Int = {
        skipWsAndComments()
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        if (i == start) fail("expected integer")
        new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.US_ASCII).toInt
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
        fail("missing P6 magic")
      i = 2
      val w = int(); val h = int(); val maxVal = int()
      if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
      if (maxVal <= 0 || maxVal > 255) fail(s"unsupported maxval $maxVal")
      if (i >= bytes.length || !isWs(bytes(i)))
        fail("expected single whitespace before raster")
      i += 1
      val need = w * h * 3
      if (bytes.length - i < need)
        fail(s"raster truncated: need $need, have ${bytes.length - i}")
      RawImage(w, h, maxVal, bytes.slice(i, i + need))
    }

    /** Per-quadrant per-channel mean over a 2×2 spatial grid — the
      * classic pooled color feature (means of integer bytes over
      * power-of-two cells are dyadic rationals: exact in DOUBLE, exact
      * in any engine).
      */
    def quadrantMeans(img: RawImage): Array[Double] = {
      val sums = new Array[Long](12)
      val counts = new Array[Long](12)
      var p = 0
      while (p < img.width * img.height) {
        val x = p % img.width
        val y = p / img.width
        val q = (y * 2 / img.height) * 2 + (x * 2 / img.width)
        var c = 0
        while (c < 3) {
          sums(q * 3 + c) += img.pixels(p * 3 + c) & 0xff
          counts(q * 3 + c) += 1
          c += 1
        }
        p += 1
      }
      Array.tabulate(12)(k => sums(k).toDouble / counts(k))
    }

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

  /** Real-codec image pipeline (q90): a deterministic 4×4 RGB image per
    * document id (pixel bytes = three chained md5 blocks, so an
    * independent engine can re-derive them), ENCODED to wire-format PPM
    * and DECODED BACK through [[MediaCodec.decodePpm]] before feature
    * pooling — the parser sits on the hot path, so the oracle match
    * proves the codec, not just the pixel math. Long-form output (one
    * row per quadrant × channel) keeps every value a dyadic-rational
    * DOUBLE. Same scale shape as [[extractFeatures]]: partition-mapped,
    * no shuffle.
    */
  def imageFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { id =>
        val pixels = new Array[Byte](48)
        var b = 0
        while (b < 3) {
          md.reset()
          md.update(s"img-v1|$id|$b".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          System.arraycopy(md.digest(), 0, pixels, b * 16, 16)
          b += 1
        }
        val decoded = MediaCodec.decodePpm(
          MediaCodec.encodePpm(RawImage(4, 4, 255, pixels)))
        val means = MediaCodec.quadrantMeans(decoded)
        for (q <- 0 until 4; c <- 0 until 3) yield
          (id, q.toLong, c.toLong, means(q * 3 + c),
            decoded.width.toLong, decoded.height.toLong)
      }
    }.toDF("asset_id", "quadrant", "channel", "mean_value", "width", "height")
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
