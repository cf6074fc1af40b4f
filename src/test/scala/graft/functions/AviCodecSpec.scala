package graft.functions

import graft.SparkSpec
import graft.functions.Multimodal.{MediaCodec, RawImage}

/** RIFF/AVI MJPEG container codec: the walk must hand back each frame
  * payload byte-for-byte (the container is lossless framing around the
  * lossy JPEG codec), report the avih geometry, skip ancillary chunks,
  * and refuse non-AVI payloads loudly.
  */
class AviCodecSpec extends SparkSpec {
  import spark.implicits._

  private def jpegFrame(seed: Int): Array[Byte] = {
    val rgb = Array((seed * 37) % 256, (seed * 101) % 256, (seed * 11) % 256)
    MediaCodec.encodeJpeg(
      RawImage(8, 8, 255, Array.tabulate[Byte](8 * 8 * 3)(i => rgb(i % 3).toByte)))
  }

  test("container round trip: frames come back byte-identical, geometry from avih") {
    val frames = (0 until 4).map(jpegFrame)
    val (w, h, back) = MediaCodec.decodeAvi(MediaCodec.encodeAvi(frames, 8, 8))
    assert((w, h) == (8, 8))
    assert(back.size == 4)
    back.zip(frames).foreach { case (b, f) =>
      assert(b.toSeq == f.toSeq, "container framing must be lossless")
    }
  }

  test("odd-length frame payloads survive the even-padding rule") {
    // raw odd-length payloads exercise chunk padding independently of
    // what javax.imageio happens to emit
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8))
    val (_, _, back) = MediaCodec.decodeAvi(MediaCodec.encodeAvi(frames, 2, 2))
    assert(back.map(_.toSeq) == frames.map(_.toSeq))
  }

  test("non-AVI payloads are refused, not misread") {
    val e1 = intercept[IllegalArgumentException] {
      MediaCodec.decodeAvi("nonsense".getBytes("US-ASCII") ++ new Array[Byte](20))
    }
    assert(e1.getMessage.contains("RIFF"))
    // a valid RIFF of the WRONG form (WAVE) must not parse as video
    val wav = MediaCodec.encodeWav(Array[Short](1, 2, 3), 8000)
    val e2 = intercept[IllegalArgumentException] { MediaCodec.decodeAvi(wav) }
    assert(e2.getMessage.contains("AVI"))
  }

  test("videoFeatures: decoded frame count, geometry, bounded error (q134 shape)") {
    val out = Multimodal.videoFeatures(spark, Seq(1L, 2L, 3L).toDF("doc_id"))
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.forall(r => r._2 == 3L && r._3 == 8L && r._4 == 8L && r._5),
      s"every doc: 3 frames, 8x8, within tolerance — got $out")
  }
}
