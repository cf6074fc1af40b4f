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

  test("'rec ' interleave lists are walked into, not skipped") {
    // standard disk-streamed AVIs wrap frame chunks in 'rec ' LISTs
    // inside 'movi'; skipping them dropped every such frame. Build the
    // wrapped form by splicing the encoder's movi content into a
    // 'rec ' list.
    val frames = Seq(Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8))
    val plain = MediaCodec.encodeAvi(frames, 2, 2)
    // locate the 'movi' list: rewrap its chunk payload in 'rec '
    val bb = java.nio.ByteBuffer.wrap(plain)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def findMovi(pos: Int): Int =
      if (new String(plain, pos, 4, "US-ASCII") == "LIST" &&
          new String(plain, pos + 8, 4, "US-ASCII") == "movi") pos
      else findMovi(pos + 1)
    val moviPos = findMovi(12)
    val moviSz = bb.getInt(moviPos + 4)
    val inner = plain.slice(moviPos + 12, moviPos + 8 + moviSz)
    val out = new java.io.ByteArrayOutputStream()
    def le(i: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(i); b.array()
    }
    out.write(plain, 0, moviPos)                      // header incl. hdrl
    out.write("LIST".getBytes("US-ASCII"))            // movi list
    out.write(le(4 + 12 + inner.length))              // 'movi' + rec list
    out.write("movi".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII"))            // rec list wrapper
    out.write(le(4 + inner.length))
    out.write("rec ".getBytes("US-ASCII"))
    out.write(inner)
    val (_, _, back) = MediaCodec.decodeAvi(out.toByteArray)
    assert(back.map(_.toSeq) == frames.map(_.toSeq),
      "'rec '-wrapped frames must decode")
  }

  test("crafted chunk size near Int.MaxValue fails cleanly (no overflow bypass)") {
    // position + sz wraps negative for sz ≈ 0x7FFFFFF0, silently
    // passing a `position + sz > end` guard — the remaining-based
    // check must refuse with the parser's own error, not OOM
    val plain = MediaCodec.encodeAvi(Seq(Array[Byte](1, 2)), 2, 2)
    val evil = plain.clone()
    // find the first frame chunk ('00dc') and corrupt its size field
    val idx = (0 until evil.length - 4).find(i =>
      new String(evil, i, 4, "US-ASCII") == "00dc").get
    val bb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(idx + 4, 0x7FFFFFF0)
    val e = intercept[IllegalArgumentException] { MediaCodec.decodeAvi(evil) }
    assert(e.getMessage.contains("overruns"))
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
