package graft.functions

import graft.SparkSpec
import Multimodal.MediaCodec

/** The RIFF/WAVE codec (q106): a hand-written chunk-walk parser on the
  * hot path, cross-checked against the JVM's independent
  * `javax.sound.sampled` WAV reader.
  */
class WavCodecSpec extends SparkSpec {

  private val golden: Array[Short] =
    Array[Short](0, 1, -1, 32767, -32768, 12345, -12345, 255)

  test("encode/decode round trip is the identity on samples and rate") {
    val (rate, back) = MediaCodec.decodeWav(MediaCodec.encodeWav(golden, 8000))
    assert(rate == 8000)
    assert(back.toSeq == golden.toSeq)
  }

  test("decode agrees with javax.sound.sampled on the same payload") {
    val payload = MediaCodec.encodeWav(golden, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    val ours = MediaCodec.decodeWav(payload)._2
    assert(raw.length == ours.length * 2)
    val theirs = java.nio.ByteBuffer.wrap(raw)
      .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer()
    val arr = new Array[Short](ours.length)
    theirs.get(arr)
    assert(arr.toSeq == ours.toSeq,
      "two independent WAV parsers must read the same samples")
  }

  test("parser skips ancillary chunks and pads odd chunk sizes") {
    val base = MediaCodec.encodeWav(golden, 8000)
    // splice a 3-byte LIST chunk (padded to 4) between header and fmt
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val extra = "LIST".getBytes(ascii) ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate, back) = MediaCodec.decodeWav(spliced)
    assert(rate == 8000 && back.toSeq == golden.toSeq)
  }

  test("parser rejects non-WAV, stereo-claiming, and truncated payloads") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("not audio at all".getBytes("US-ASCII"))
    }
    val payload = MediaCodec.encodeWav(golden, 8000)
    val stereo = payload.clone()
    stereo(22) = 2 // channels field
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(stereo) }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(payload.dropRight(3))
    }
  }
}
