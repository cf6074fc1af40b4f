package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode/feature-extraction
  * runs as a partition-mapped batch operator (the Scala analog of a
  * Pandas-batch UDF: one iterator of rows per partition, library handles
  * amortized per-partition, vectorizable batch shape).
  *
  * Codec status: every format is REAL — PPM (netpbm P6) and WAV are
  * hand-written wire-format parsers on the q90/q106 hot paths (the WAV
  * chunk walk is cross-checked against `javax.sound.sampled`),
  * [[MediaCodec.decodeImageIo]] routes PNG/JPEG through the JVM's
  * built-in `javax.imageio` codecs (q98/q99), and video enters through
  * [[MediaCodec.decodeAvi]] — a RIFF/AVI container walk (the WAV walk's
  * RIFF-family sibling) whose MJPEG frames rasterize through the real
  * JPEG codec (q134). Opaque payloads that are not media at all get a
  * [[MediaCodec.fingerprintEmbedding]] content fingerprint (q32), which
  * is a feature, not a decode.
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

    // ImageIO's DEFAULT stream cache backs every read/write with a temp
    // file (FileCacheImage*Stream): one file create+delete per codec
    // call, all in the same tmpdir, all registered with the global
    // StreamCloser lock. At 32 concurrent decode tasks that serializes
    // the whole stage on filesystem metadata (measured: 0.16 ms/image
    // single-task → 4.3 ms/image 32-wide, ~27× per-image CPU inflation;
    // the suite's three codec queries read 216 task-run-s for ~5 s of
    // work). These codecs only ever see in-memory byte arrays, so every
    // ImageIO call below constructs its MemoryCacheImage*Stream
    // EXPLICITLY — scoped to this object, without flipping the
    // process-wide ImageIO.setUseCache default under an embedding
    // application's feet (a host decoding large images from the network
    // may rely on file-backed streams to bound heap).

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
      * width×height×3 raw sample bytes. An actual wire-format parser —
      * the q90 payloads round-trip through it.
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
      // Long: a crafted header like "P6 26755 26755 255" overflows
      // w*h*3 as Int to a negative, the truncation check passes, and
      // an invalid (empty-raster) RawImage escapes instead of this
      // parser's clear error
      val need = w.toLong * h * 3
      if (bytes.length - i < need)
        fail(s"raster truncated: need $need, have ${bytes.length - i}")
      RawImage(w, h, maxVal, bytes.slice(i, i + need.toInt))
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
      // a 1-pixel-wide/tall raster leaves its x-high/y-high quadrants
      // EMPTY; 0/0 would emit NaN that silently poisons every
      // downstream aggregate — an empty quadrant reports 0.0 (defined,
      // oracle-replayable) instead
      Array.tabulate(12)(k =>
        if (counts(k) == 0) 0.0 else sums(k).toDouble / counts(k))
    }

    /** Content-fingerprint embedding for OPAQUE payloads — the feature a
      * curation pipeline attaches to assets it cannot (or chooses not
      * to) decode: slot `s` is the 60-bit prefix of
      * `md5(payload ++ ('a'+s))`, reduced mod 1024 and scaled into
      * [0,1). Deterministic and engine-replayable (the q32 oracle
      * re-derives every slot in SQL), and every value lands on a 1/1024
      * grid — a dyadic rational, exact in both float32 and float64, so
      * the vector round-trips bit-identically through parquet. Content
      * decode is NOT this function's job: every media format in the
      * engine (PPM/PNG/JPEG/WAV/AVI-MJPEG) has a real codec —
      * [[decodePpm]], [[decodeImageIo]], [[decodeWav]], [[decodeAvi]].
      */
    def fingerprintEmbedding(payload: Array[Byte], slots: Int = 8): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(slots) { s =>
        md.reset()
        md.update(payload)
        md.update(('a' + s).toByte)
        val hex = md.digest().take(8).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex.take(15), 16) % 1024L) / 1024.0f
      }
    }

    /** Encode MJPEG frames as a minimal RIFF/AVI container per the
      * public format (RIFF 'AVI ' → LIST 'hdrl' {avih, LIST 'strl'
      * {strh 'vids'/'MJPG', strf BITMAPINFOHEADER}} → LIST 'movi'
      * {'00dc' frames} → 'idx1') — the video wire format a JVM can emit
      * with no codec library, because each frame payload is a complete
      * JPEG the built-in `javax.imageio` codec produced.
      */
    def encodeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
        fps: Int = 25): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes(ascii)); bb.putInt(body.length); bb.put(body)
        bb.array() // trailing pad byte (if any) stays zero
      }
      def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] =
        chunk("LIST", listType.getBytes(ascii) ++ bodies.flatten)
      def le(ints: Int*): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(ints.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        ints.foreach(bb.putInt); bb.array()
      }
      val avih = chunk("avih", le(
        1000000 / fps, 0, 0, 0x10 /* AVIF_HASINDEX */, frames.length, 0, 1,
        0, width, height, 0, 0, 0, 0))
      val strh = chunk("strh",
        "vids".getBytes(ascii) ++ "MJPG".getBytes(ascii) ++
          le(0, 0, 0, 1, fps, 0, frames.length, 0, -1, 0) ++
          le((height << 16) | width)) // rcFrame as two 16-bit pairs
      val strf = chunk("strf", le(40, width, height, (24 << 16) | 1)
        ++ "MJPG".getBytes(ascii) ++ le(width * height * 3, 0, 0, 0, 0))
      val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
      val moviBodies = frames.map(f => chunk("00dc", f))
      val movi = list("movi", moviBodies)
      // idx1: one entry per frame — offset is relative to the 'movi'
      // list-type fourcc, per the format's convention
      val idx = {
        var off = 4
        val entries = frames.zip(moviBodies).map { case (f, c) =>
          val e = "00dc".getBytes(ascii) ++ le(0x10, off, f.length)
          off += c.length
          e
        }
        chunk("idx1", entries.flatten.toArray)
      }
      chunk("RIFF", "AVI ".getBytes(ascii) ++ hdrl ++ movi ++ idx)
    }

    /** REAL video-container decode: RIFF/AVI chunk walk per the public
      * format — RIFF signature + 'AVI ' form, LIST recursion through
      * 'hdrl' (for the avih geometry) and 'movi' (collecting compressed
      * '..dc'/'..db' frame payloads), ancillary chunks skipped with
      * even-byte padding, exactly like [[decodeWav]]'s walk on the same
      * RIFF family. Frame payloads come back verbatim (each a complete
      * JPEG for MJPEG streams) for [[decodeImageIo]] to rasterize.
      * Returns (width, height, frames).
      */
    def decodeAvi(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      def fail(msg: String) =
        throw new IllegalArgumentException(s"bad AVI: $msg")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t)
        new String(t, java.nio.charset.StandardCharsets.US_ASCII)
      }
      if (bytes.length < 12 || tag() != "RIFF") fail("missing RIFF signature")
      bb.getInt() // declared riff size (trust actual bounds instead)
      if (tag() != "AVI ") fail("not an AVI form")
      var width = -1; var height = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = tag(); val sz = bb.getInt()
          // overrun check phrased as `sz > remaining` (the decodeWav
          // form): `position + sz > end` wraps negative for a crafted
          // sz near Int.MaxValue and SKIPS the guard — the follow-on
          // allocation/position would then OOM or throw a raw
          // BufferUnderflow instead of this parser's clean error
          if (sz < 0 || sz > end - bb.position()) fail(s"chunk '$id' overruns payload")
          val next = bb.position() + sz + (sz & 1) // chunks pad to even
          id match {
            case "LIST" =>
              tag() match {
                // 'rec ' is the standard interleave grouping: frame
                // chunks of disk-streamed AVIs arrive wrapped in it,
                // and skipping it silently dropped every such frame
                case "hdrl" | "movi" | "strl" | "rec " =>
                  walk(bb.position() + sz - 4)
                case _ => () // ancillary list (INFO, …): skip
              }
            case "avih" =>
              if (sz < 40) fail("avih too short")
              bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
              bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
              width = bb.getInt(); height = bb.getInt()
            case _ if id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) =>
              val f = new Array[Byte](sz); bb.get(f); frames += f
            case _ => () // strh/strf/idx1/JUNK…: geometry comes from avih
          }
          bb.position(math.min(next, bytes.length))
        }
      }
      walk(bytes.length)
      if (width <= 0 || height <= 0) fail("no avih geometry")
      if (frames.isEmpty) fail("no frame chunks in movi")
      (width, height, frames.toSeq)
    }

    /** RawImage → BufferedImage (packed-int RGB, no alpha). */
    private def toBuffered(img: RawImage): java.awt.image.BufferedImage = {
      val bi = new java.awt.image.BufferedImage(img.width, img.height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < img.width * img.height) {
        val r = img.pixels(p * 3) & 0xff
        val g = img.pixels(p * 3 + 1) & 0xff
        val b = img.pixels(p * 3 + 2) & 0xff
        bi.setRGB(p % img.width, p / img.width, (r << 16) | (g << 8) | b)
        p += 1
      }
      bi
    }

    /** REAL encode through `javax.imageio` — the JVM's built-in PNG and
      * JPEG codecs, no external dependency. PNG is lossless (decoded
      * raster is bit-identical, so exact oracles apply); JPEG goes
      * through [[encodeJpeg]] for an explicit quality setting.
      */
    def encodeImageIo(img: RawImage, format: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        if (!javax.imageio.ImageIO.write(toBuffered(img), format, ios))
          throw new IllegalArgumentException(s"no ImageIO writer for '$format'")
      } finally ios.close()
      baos.toByteArray
    }

    /** REAL JPEG encode at an explicit compression quality (the default
      * writer's 0.75 puts the luminance DC quant step at 16 — too coarse
      * for a bounded-error round-trip check; 0.95 keeps DC steps small).
      */
    def encodeJpeg(img: RawImage, quality: Float = 0.95f): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = w.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(toBuffered(img), null, null), param)
      } finally { w.dispose(); ios.close() }
      baos.toByteArray
    }

    /** REAL decode through `javax.imageio` (format sniffed from the
      * payload's magic bytes — PNG, JPEG, GIF, BMP as shipped by the
      * JVM). Returns row-major RGB like [[decodePpm]].
      */
    def decodeImageIo(bytes: Array[Byte]): RawImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read closes the stream itself on success; the guarded
      // close only covers the decoder-threw path (a second close on an
      // ImageInputStream raises IOException("closed"))
      val bi = try javax.imageio.ImageIO.read(iis)
        finally { try iis.close() catch { case _: java.io.IOException => () } }
      if (bi == null)
        throw new IllegalArgumentException("ImageIO: unrecognized image payload")
      val w = bi.getWidth; val h = bi.getHeight
      val out = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val rgb = bi.getRGB(p % w, p / w)
        out(p * 3) = ((rgb >> 16) & 0xff).toByte
        out(p * 3 + 1) = ((rgb >> 8) & 0xff).toByte
        out(p * 3 + 2) = (rgb & 0xff).toByte
        p += 1
      }
      RawImage(w, h, 255, out)
    }

    /** Encode 16-bit mono PCM as a canonical RIFF/WAVE payload (44-byte
      * header + little-endian samples) — the audio wire format a JVM can
      * emit with no codec library.
      */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes(ascii))
      bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(1) // mono
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2) // byte rate
      bb.putShort(2) // block align
      bb.putShort(16) // bits/sample
      bb.put("data".getBytes(ascii)); bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** REAL audio decode: RIFF/WAVE chunk walk per the public format —
      * RIFF signature, WAVE form type, then chunks (`fmt `, `data`,
      * anything else skipped with even-byte padding). Accepts only
      * 16-bit mono PCM; anything else is an explicit error, never a
      * silent misread. Returns (sampleRate, samples).
      */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
      def fail(msg: String) =
        throw new IllegalArgumentException(s"bad WAV: $msg")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t)
        new String(t, java.nio.charset.StandardCharsets.US_ASCII)
      }
      if (bytes.length < 12 || tag() != "RIFF") fail("missing RIFF signature")
      bb.getInt() // declared riff size (trust actual bounds instead)
      if (tag() != "WAVE") fail("not a WAVE form")
      var sampleRate = -1
      var samples: Array[Short] = null
      while (bb.remaining() >= 8) {
        val id = tag(); val sz = bb.getInt()
        if (sz < 0 || sz > bb.remaining()) fail(s"chunk '$id' overruns payload")
        val next = bb.position() + sz + (sz & 1) // chunks pad to even
        id match {
          case "fmt " =>
            if (sz < 16) fail("fmt chunk too short")
            val fmt = bb.getShort(); val ch = bb.getShort()
            sampleRate = bb.getInt(); bb.getInt(); bb.getShort()
            val bits = bb.getShort()
            if (fmt != 1) fail(s"not PCM (format $fmt)")
            if (ch != 1) fail(s"not mono ($ch channels)")
            if (bits != 16) fail(s"not 16-bit ($bits)")
          case "data" =>
            if (sampleRate < 0) fail("data chunk before fmt")
            if (sz % 2 != 0) fail("odd data length for 16-bit samples")
            samples = new Array[Short](sz / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
          case _ => () // ancillary chunk (LIST, fact, …): skip
        }
        bb.position(math.min(next, bytes.length))
      }
      if (samples == null) fail("no data chunk")
      (sampleRate, samples)
    }

    /** Frame-sampling plan a video decoder would follow: one frame per
      * 1000ms, at least 1.
      */
    def framesToSample(durationMs: Long): Int =
      math.max(1, (durationMs / 1000L).toInt)

    /** Resize plan: aspect-preserving fit into maxDim × maxDim — the
      * geometry a real image resize applies.
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
  /** The deterministic 4×4 RGB raster for document `id`: 48 pixel bytes
    * = three chained md5 blocks of "img-v1|id|b" — re-derivable by any
    * engine with an md5 (the q90/q98 oracles replay it in SQL).
    */
  private def goldenPixels(md: java.security.MessageDigest, id: Long): Array[Byte] = {
    val pixels = new Array[Byte](48)
    var b = 0
    while (b < 3) {
      md.reset()
      md.update(s"img-v1|$id|$b".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      System.arraycopy(md.digest(), 0, pixels, b * 16, 16)
      b += 1
    }
    pixels
  }

  def imageFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { id =>
        val decoded = MediaCodec.decodePpm(
          MediaCodec.encodePpm(RawImage(4, 4, 255, goldenPixels(md, id))))
        val means = MediaCodec.quadrantMeans(decoded)
        for (q <- 0 until 4; c <- 0 until 3) yield
          (id, q.toLong, c.toLong, means(q * 3 + c),
            decoded.width.toLong, decoded.height.toLong)
      }
    }.toDF("asset_id", "quadrant", "channel", "mean_value", "width", "height")
  }

  /** The q90 pipeline routed through a REAL `javax.imageio` PNG round
    * trip (q98): same golden raster, ENCODED to an actual PNG payload
    * and DECODED by the JVM's PNG codec before pooling. PNG is lossless,
    * so the decoded raster is bit-identical to the source and the same
    * engine-independent quadrant-mean oracle applies — two independent
    * codecs (the netpbm parser and ImageIO PNG) must both agree with
    * the SQL-replayed pixel math. Partition-mapped, no shuffle.
    */
  def pngCodecFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { id =>
        val decoded = MediaCodec.decodeImageIo(
          MediaCodec.encodeImageIo(RawImage(4, 4, 255, goldenPixels(md, id)), "png"))
        val means = MediaCodec.quadrantMeans(decoded)
        for (q <- 0 until 4; c <- 0 until 3) yield
          (id, q.toLong, c.toLong, means(q * 3 + c),
            decoded.width.toLong, decoded.height.toLong)
      }
    }.toDF("asset_id", "quadrant", "channel", "mean_value", "width", "height")
  }

  /** REAL JPEG round trip (q99). JPEG is LOSSY, so exact pixel oracles
    * cannot apply; the oracle-able facts are the decoded geometry and a
    * BOUNDED reconstruction error. Each asset is a uniform-color 8×8
    * image (color = first 3 md5 bytes of "jpg-v1|id") — one full DCT
    * block of pure DC energy, so at quality 0.95 the decoder must land
    * within a few quant steps of the source on every pixel. Emits
    * (asset_id, byte-geometry, max |err| over all pixels×channels, and
    * the ≤`tol` verdict the oracle pins to true).
    */
  def jpegCodecRoundtrip(spark: SparkSession, docs: DataFrame,
      tol: Int = 12): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        md.reset()
        md.update(s"jpg-v1|$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val d = md.digest()
        val rgb = Array(d(0) & 0xff, d(1) & 0xff, d(2) & 0xff)
        val pixels = Array.tabulate[Byte](8 * 8 * 3)(i => rgb(i % 3).toByte)
        val decoded = MediaCodec.decodeImageIo(
          MediaCodec.encodeJpeg(RawImage(8, 8, 255, pixels)))
        var maxErr = 0
        var i = 0
        while (i < decoded.pixels.length) {
          val e = math.abs((decoded.pixels(i) & 0xff) - rgb(i % 3))
          if (e > maxErr) maxErr = e
          i += 1
        }
        (id, decoded.width.toLong, decoded.height.toLong, maxErr <= tol)
      }
    }.toDF("asset_id", "width", "height", "within_tol")
  }

  /** REAL audio codec pipeline (q106): a deterministic 256-sample
    * 16-bit PCM clip per document (sample bytes = 32 chained md5 blocks,
    * little-endian pairs — re-derivable in SQL), encoded to an actual
    * RIFF/WAVE payload and decoded back through
    * [[MediaCodec.decodeWav]]'s chunk walk before feature extraction, so
    * the oracle match certifies the wire format, not just the sample
    * math. Features are exact integer/dyadic arithmetic (energy as Σv²,
    * zero crossings, min/max, mean = Σv/256) — no libm anywhere, so
    * they hash-match any engine. Partition-mapped, no shuffle.
    */
  def audioFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val samples = new Array[Short](256)
        var b = 0
        while (b < 32) {
          md.reset()
          md.update(s"wav-v1|$id|$b".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          val d = md.digest()
          var j = 0
          while (j < 8) {
            samples(b * 8 + j) =
              ((d(j * 2) & 0xff) | ((d(j * 2 + 1) & 0xff) << 8)).toShort
            j += 1
          }
          b += 1
        }
        val (rate, dec) = MediaCodec.decodeWav(
          MediaCodec.encodeWav(samples, 8000))
        var sumSq = 0L; var sum = 0L; var crossings = 0L
        var mn = Int.MaxValue; var mx = Int.MinValue
        var i = 0
        while (i < dec.length) {
          val v = dec(i).toInt
          sumSq += v.toLong * v; sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          if (i > 0 && (dec(i - 1) < 0) != (v < 0)) crossings += 1
          i += 1
        }
        (id, rate.toLong, dec.length.toLong, sumSq, crossings,
          mn.toLong, mx.toLong, sum.toDouble / dec.length)
      }
    }.toDF("asset_id", "sample_rate", "n_samples", "sum_sq",
      "zero_crossings", "min_s", "max_s", "mean_s")
  }

  /** REAL video codec pipeline (q134): per document, three uniform-color
    * 8×8 frames (frame f's color = first 3 md5 bytes of "avi-v1|id|f")
    * are JPEG-encoded by the real `javax.imageio` codec, wrapped in an
    * actual RIFF/AVI MJPEG container, and decoded back through
    * [[MediaCodec.decodeAvi]]'s chunk walk + per-frame
    * [[MediaCodec.decodeImageIo]] — container parser AND frame codec
    * both on the hot path. Temporal pooling over the decoded frames
    * yields the oracle-able facts: frame count, container geometry, and
    * the bounded per-pixel reconstruction error (the q99 device, maxed
    * across every frame). Partition-mapped, no shuffle.
    */
  def videoFeatures(spark: SparkSession, docs: DataFrame,
      tol: Int = 12): DataFrame = {
    import spark.implicits._
    // widen BEFORE the decode ([[graft.Par.toCores]] — conditional):
    // the per-row cost here is codec CPU (3 JPEG encodes + an AVI round
    // trip + 3 ImageIO decodes per id), so parallelism must come from
    // the cluster's cores, not from however few splits the
    // 8-byte-per-row id scan happens to produce (one parquet file = one
    // task = serial decode, measured 2.2 s of a 5.3 s query on a
    // 32-core box). On an already-split input the repair is a no-op —
    // the unconditional form stacked a redundant exchange + second
    // 32-wide heavy stage on top of a 32-split scan (measured 1.1 →
    // 2.8 s when the bench fixtures gained split-sized files).
    graft.Par.toCores(docs.select(col("doc_id"))).as[Long]
      .mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val colors = Array.tabulate(3) { f =>
          md.reset()
          md.update(s"avi-v1|$id|$f".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          val d = md.digest()
          Array(d(0) & 0xff, d(1) & 0xff, d(2) & 0xff)
        }
        val jpegs = colors.map { rgb =>
          val pixels = Array.tabulate[Byte](8 * 8 * 3)(i => rgb(i % 3).toByte)
          MediaCodec.encodeJpeg(RawImage(8, 8, 255, pixels))
        }
        val (w, h, frames) = MediaCodec.decodeAvi(
          MediaCodec.encodeAvi(jpegs.toSeq, 8, 8))
        var maxErr = 0
        frames.zip(colors).foreach { case (bytes, rgb) =>
          val img = MediaCodec.decodeImageIo(bytes)
          var i = 0
          while (i < img.pixels.length) {
            val e = math.abs((img.pixels(i) & 0xff) - rgb(i % 3))
            if (e > maxErr) maxErr = e
            i += 1
          }
        }
        (id, frames.length.toLong, w.toLong, h.toLong, maxErr <= tol)
      }
    }.toDF("asset_id", "n_frames", "width", "height", "within_tol")
  }

  /** The partition-mapped feature operator over opaque assets: batch
    * shape = one partition iterator, exactly how a vectorized UDF would
    * consume it. Features are [[MediaCodec.fingerprintEmbedding]]
    * content fingerprints (the payloads here are opaque stand-ins;
    * decodable media goes through the real codec pipelines — q90, q98,
    * q99, q106, q134). No shuffle; scales with input splits.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val (w, h) = MediaCodec.resizePlan(a.width, a.height)
        MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
          MediaCodec.framesToSample(a.duration_ms), w, h,
          MediaCodec.fingerprintEmbedding(a.payload))
      }
    }
  }
}
