package graft.functions

import graft.SparkSpec
import Multimodal.{MediaCodec, RawImage}

class PpmCodecSpec extends SparkSpec {

  private val golden = RawImage(2, 2, 255,
    Array[Byte](255.toByte, 0, 0, /* red   */ 0, 255.toByte, 0, /* green */
      0, 0, 255.toByte, /* blue */ 128.toByte, 128.toByte, 128.toByte))

  test("encode/decode round trip is the identity on a golden image") {
    val back = MediaCodec.decodePpm(MediaCodec.encodePpm(golden))
    assert(back.width == 2 && back.height == 2 && back.maxVal == 255)
    assert(back.pixels.toSeq == golden.pixels.toSeq)
  }

  test("parser accepts comments and arbitrary header whitespace") {
    val header = "P6 # a comment\n# another line\n  2\t2 # dims\n 255\n"
    val bytes = header.getBytes("US-ASCII") ++ golden.pixels
    val img = MediaCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == golden.pixels.toSeq)
  }

  test("parser rejects bad magic, bad dims, and truncated rasters") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodePpm("P6\n0 2\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodePpm(
        MediaCodec.encodePpm(golden).dropRight(1))
    }
  }

  test("quadrant means pool each 2x2 cell exactly") {
    // 2x2 image: each pixel is its own quadrant
    val m = MediaCodec.quadrantMeans(golden)
    assert(m.length == 12)
    assert(m.take(3).toSeq == Seq(255.0, 0.0, 0.0), "q0 = red pixel")
    assert(m.slice(3, 6).toSeq == Seq(0.0, 255.0, 0.0), "q1 = green pixel")
    assert(m.slice(9, 12).toSeq == Seq(128.0, 128.0, 128.0), "q3 = gray pixel")
    // 4x4 uniform image: every quadrant mean equals the constant
    val uni = RawImage(4, 4, 255, Array.fill(48)(7.toByte))
    assert(MediaCodec.quadrantMeans(uni).forall(_ == 7.0))
  }
}
