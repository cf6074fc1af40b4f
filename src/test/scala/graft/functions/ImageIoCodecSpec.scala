package graft.functions

import graft.SparkSpec
import Multimodal.{MediaCodec, RawImage}

/** The `javax.imageio` codec path (q98 PNG, q99 JPEG): real encoders
  * and decoders shipped with the JVM, no external dependency.
  */
class ImageIoCodecSpec extends SparkSpec {

  private val golden = RawImage(2, 2, 255,
    Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 128.toByte, 128.toByte, 128.toByte))

  test("codec path leaves the process-wide ImageIO cache default alone") {
    // the codecs construct MemoryCacheImage*Streams EXPLICITLY (the
    // default temp-file stream cache — one file create+delete per call
    // under the global StreamCloser lock — serialized 32 concurrent
    // decode tasks on filesystem metadata, ~27x per-image CPU at
    // 32-wide), WITHOUT flipping ImageIO.setUseCache for the whole
    // JVM: an embedding application keeps its own default
    val before = javax.imageio.ImageIO.getUseCache
    MediaCodec.decodeImageIo(MediaCodec.encodeImageIo(golden, "png"))
    assert(javax.imageio.ImageIO.getUseCache == before)
  }

  test("PNG round trip is lossless (identity on pixels)") {
    val payload = MediaCodec.encodeImageIo(golden, "png")
    // a real PNG payload: 8-byte signature
    assert(payload.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val back = MediaCodec.decodeImageIo(payload)
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.toSeq == golden.pixels.toSeq)
  }

  test("PNG decode agrees with the PPM parser on the same raster") {
    val viaPng = MediaCodec.decodeImageIo(MediaCodec.encodeImageIo(golden, "png"))
    val viaPpm = MediaCodec.decodePpm(MediaCodec.encodePpm(golden))
    assert(viaPng.pixels.toSeq == viaPpm.pixels.toSeq)
  }

  test("JPEG round trip preserves geometry and bounds the error on a uniform block") {
    val rgb = Array(200, 60, 140)
    val uni = RawImage(8, 8, 255, Array.tabulate[Byte](192)(i => rgb(i % 3).toByte))
    val payload = MediaCodec.encodeJpeg(uni)
    // a real JFIF payload: SOI marker
    assert((payload(0) & 0xff) == 0xd8 + 0x00 || (payload(0) & 0xff) == 0xff)
    assert((payload(1) & 0xff) == 0xd8)
    val back = MediaCodec.decodeImageIo(payload)
    assert(back.width == 8 && back.height == 8)
    val maxErr = back.pixels.indices
      .map(i => math.abs((back.pixels(i) & 0xff) - rgb(i % 3))).max
    assert(maxErr <= 12, s"uniform-block JPEG error $maxErr exceeds bound")
  }

  test("decode rejects a non-image payload") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeImageIo("definitely not an image".getBytes("US-ASCII"))
    }
  }
}
