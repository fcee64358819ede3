package graft.operators

import graft.SparkTestBase

/** FLAC/MP3 container-census invariants beyond the q_m14/q_m15 planted
  * classes: field round trips at the bit-packing edges, every defect
  * class is a row (never a failure), ID3 tags skip correctly, and the
  * frame-length hop is what keeps MP3 sync. */
class FlacMp3Spec extends SparkTestBase {
  import spark.implicits._

  private def flac(payloads: (Long, Array[Byte])*): Map[Long, Multimodal.FlacInfo] =
    Multimodal.parseFlac(payloads.toSeq.toDF("id", "payload"), "id", "payload")
      .collect().map(m => m.id -> m).toMap

  private def mp3(payloads: (Long, Array[Byte])*): Map[Long, Multimodal.Mp3Census] =
    Multimodal.parseMp3(payloads.toSeq.toDF("id", "payload"), "id", "payload")
      .collect().map(m => m.id -> m).toMap

  test("FLAC: bit-packing edges round-trip; defect classes are rows") {
    // 20-bit rate ceiling-ish, 8 channels, 32 bits, 36-bit sample count
    val big = Multimodal.flacMeta(655350, 8, 32, (1L << 36) - 1)
    val small = Multimodal.flacMeta(8000, 1, 4, 0L, padding = true)
    val got = flac((1L, big), (2L, small))
    assert(got(1L).valid && got(1L).sample_rate == 655350 &&
      got(1L).channels == 8 && got(1L).bits == 32 &&
      got(1L).total_samples == (1L << 36) - 1 && got(1L).n_meta_blocks == 1)
    assert(got(2L).valid && got(2L).bits == 4 && got(2L).total_samples == 0 &&
      got(2L).n_meta_blocks == 2)
    val base = Multimodal.flacMeta(44100, 2, 16, 1000L)
    def mut(m: Array[Byte] => Unit) = { val b = base.clone(); m(b); b }
    val bad = flac(
      (1L, "OggS junk".getBytes), // wrong container entirely
      (2L, mut(b => b(0) = 'g')),
      (3L, base.take(6)),
      (4L, mut(b => b(4) = 0x81.toByte)), // first block claims type 1
      (5L, mut(b => b(7) = 33.toByte)),   // STREAMINFO length 33
      (6L, base.take(30)))
    assert(bad.values.forall(!_.valid))
    assert(bad(1L).reason == "bad-magic" && bad(2L).reason == "bad-magic")
    assert(bad(3L).reason == "truncated-block-header")
    assert(bad(4L).reason == "streaminfo-not-first")
    assert(bad(5L).reason == "bad-streaminfo-length")
    assert(bad(6L).reason == "truncated-block")
  }

  test("MP3: ID3v2/ID3v1 skip, VBR detection, and the length hop keeps sync") {
    val frames = Multimodal.mp3Frames(0, Seq(9, 9, 9), Seq(false, true, false))
    // ID3v2 prefix (synchsafe size 300 = 0x02 0x2c) + frames + ID3v1 trailer
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 2, 0x2c) ++
      new Array[Byte](300)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val vbr = Multimodal.mp3Frames(1, Seq(5, 9, 14), Seq(false, false, false))
    // ID3v2.4 FOOTER flag (0x10): tag = 10 header + size + 10 footer
    val id3v2Footer = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 2, 0x2c) ++
      new Array[Byte](300) ++
      Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 2, 0x2c)
    val got = mp3(
      (1L, frames), (2L, id3v2 ++ frames ++ id3v1), (3L, vbr),
      (4L, id3v2Footer ++ frames))
    assert(got(4L).valid && got(4L).n_frames == 3,
      s"footered ID3v2 tag must skip its extra 10 bytes: ${got(4L)}")
    assert(got(1L).valid && got(1L).sample_rate == 44100 &&
      got(1L).n_frames == 3 && got(1L).n_samples == 3456 && got(1L).cbr)
    assert(got(2L).valid && got(2L).n_frames == 3 && got(2L).cbr,
      s"tags must skip cleanly: ${got(2L)}")
    assert(got(3L).valid && got(3L).sample_rate == 48000 && !got(3L).cbr)
    // defect classes
    def mut(m: Array[Byte] => Unit) = { val b = frames.clone(); m(b); b }
    val frameLen = 144 * 128 * 1000 / 44100 // brIdx 9 = 128 kbps, no pad
    val bad = mp3(
      (1L, "random".getBytes),
      (2L, mut(b => b(1) = 0xf2.toByte)),          // MPEG-2 Layer III
      (3L, mut(b => b(2) = 0xf4.toByte)),          // bitrate index 15
      (4L, mut(b => b(2) = 0x9c.toByte)),          // samplerate index 3
      (5L, frames.take(frameLen + 2)),              // frame 2 header cut
      (6L, frames.take(2 * frameLen + 20)),         // frame 2 payload cut (pad bit)
      (7L, mut(b => b(frameLen) = 0x00.toByte)))    // sync lost at frame 2
    assert(bad.values.forall(!_.valid))
    assert(bad(1L).reason == "no-sync")
    assert(bad(2L).reason == "unsupported-version-or-layer")
    assert(bad(3L).reason == "bad-bitrate-index")
    assert(bad(4L).reason == "bad-samplerate-index")
    assert(bad(5L).reason == "truncated-frame-header")
    assert(bad(6L).reason == "truncated-frame")
    assert(bad(7L).reason == "lost-sync")
  }
}
