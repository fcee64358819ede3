package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Multimodal-column support: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * REAL decode lives per modality: [[ImageCodec]] decodes PNG/JPEG/BMP via
  * `javax.imageio` (luma grids, aHash/dHash, gray bucket features —
  * q_m9/q_m10), and [[pcmVad]] below does integer DSP over raw PCM audio
  * (q_m8). The remaining STUB below (clearly marked) derives fake features
  * from payload bytes; it stays as the EXECUTABLE SPEC behind the
  * q_m2/m5/m6/m7 oracle replays (its arithmetic is SQL-expressible, so
  * DuckDB can replay it exactly) and as the swap point for codecs the JDK
  * lacks (video frames, CLIP-class learned towers). The media schema, the
  * partition-preserving typed `mapPartitions` batch shape, feature vector
  * layout, and the frame-sampling slicing are the same production plumbing
  * under both the stub and the real codecs.
  *
  * Scale notes: decode runs per-partition with zero shuffles; feature
  * vectors are fixed-width `array<float>` ready for the SimilaritySearch
  * operators; payloads never pass through the driver.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, duration_ms: Int,
                           features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** ======================= STUB CODEC =======================
    * Deterministic fake decoder standing in for libjpeg/ffmpeg/etc., which
    * are not available in this environment. Derives stable pseudo-metadata
    * and a feature vector purely from payload bytes so tests are exact.
    * Replace this object to integrate a real codec; nothing else changes.
    */
  object StubCodec {
    def dims(payload: Array[Byte]): (Int, Int) =
      if (payload.isEmpty) (0, 0)
      else (16 + (payload.head & 0x3f), 16 + (payload.last & 0x3f))

    def durationMs(payload: Array[Byte]): Int = payload.length * 7

    /** Fixed-width feature vector: mean byte value per stride bucket. */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload.isEmpty) return out
      val counts = new Array[Int](dim)
      var i = 0
      while (i < payload.length) {
        val b = i % dim
        out(b) += (payload(i) & 0xff)
        counts(b) += 1
        i += 1
      }
      var j = 0
      while (j < dim) {
        if (counts(j) > 0) out(j) = out(j) / counts(j) / 255.0f
        j += 1
      }
      out
    }
  }
  /* ===================== END STUB CODEC ===================== */

  /** Build a media table from the documents table: payload = UTF-8 bytes of
    * the text (stand-in for real blobs), kind assigned deterministically.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Raw-file ingestion: read a directory of media blobs as binary rows via
    * Spark's `binaryFile` source (path, modificationTime, length, content).
    * This is how real image/audio/video corpora enter the engine — each
    * file becomes one row, read distributed, payloads never on the driver.
    * `maxBytes` guards against a stray huge blob blowing an executor.
    */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                      glob: String = "*", maxBytes: Long = 64L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)

  private val KindByExt = Map(
    "jpg" -> "image", "jpeg" -> "image", "png" -> "image",
    "wav" -> "audio", "mp3" -> "audio", "flac" -> "audio",
    "mp4" -> "video", "mkv" -> "video", "webm" -> "video")

  /** Lift a binaryFile frame into the typed media table: media_id is the
    * xxhash64 of the file path (stable across re-ingestion), kind inferred
    * from the extension, unknown extensions dropped.
    */
  def mediaFromFiles(files: DataFrame): Dataset[MediaRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    val kindExpr = KindByExt.foldLeft(lit(null).cast("string")) {
      case (acc, (ext, kind)) =>
        when(lower(col("path")).endsWith("." + ext), kind).otherwise(acc)
    }
    files.select(
      xxhash64(col("path")).as("media_id"),
      kindExpr.as("kind"),
      col("content").as("payload"))
      .filter(col("kind").isNotNull)
      .as[MediaRecord]
  }

  /** Decode + feature-extract: one partition-preserving typed pass; batch
    * shape (iterator-in/iterator-out per partition) is exactly where a
    * vectorized/native decoder would batch its calls.
    */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val (w, h) = StubCodec.dims(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h,
          StubCodec.durationMs(r.payload), StubCodec.features(r.payload, dim))
      }
    }
  }

  /** Frame sampling for video payloads: n evenly-spaced byte windows
    * (a real implementation samples decoded frames; slicing shape is the
    * same). Non-video rows produce no frames.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int, frameBytes: Int = 32): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video" || r.payload.isEmpty) Iterator.empty
      else {
        val stride = math.max(1, (r.payload.length - frameBytes).max(0) / math.max(1, n - 1))
        (0 until n).iterator.map { i =>
          val start = math.min(i * stride, math.max(0, r.payload.length - 1))
          val end = math.min(start + frameBytes, r.payload.length)
          Frame(r.media_id, i, r.payload.slice(start, end))
        }
      }
    }
  }

  case class CaptionedMedia(media_id: Long, payload: Array[Byte], caption: String)

  case class AlignPair(media_id: Long, caption_chars: Int,
                       media_feats: Array[Float], caption_feats: Array[Float])

  /** Image-text alignment scoring (the LAION/CLIP-score curation shape —
    * Schuhmann et al. 2022, arXiv:2210.08402 filter at CLIP similarity;
    * Radford et al. 2021, arXiv:2103.00020 for the two-tower scoring):
    * embed both sides of a (media payload, caption) pair and score their
    * CENTERED cosine. The stub codec stands in for BOTH encoders — a real
    * deployment swaps in a CLIP image tower for the payload side and its
    * text tower for the caption side; the pairing, batch shape, scoring
    * and thresholding below are the production plumbing either way.
    *
    * Centering matters with the stub features: bucket-mean vectors of any
    * text are near-parallel uncentered (the shared-mean component — the
    * same effect [[SimilaritySearch]] documents for SRP), so the raw
    * cosine of everything is ~1. Subtracting each vector's own mean scores
    * the bucket-profile FLUCTUATION, which does distinguish a caption
    * drawn from the payload from one that wasn't.
    *
    * One partition-preserving typed pass (both feature vectors per row,
    * payloads never co-locate or hit the driver) + a row-local score
    * expression: rides the scan at 100 TB, zero shuffles.
    */
  def captionFeaturePairs(df: DataFrame, idCol: String, payloadCol: String,
                          captionCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("payload"),
        coalesce(col(captionCol), lit("")).as("caption"))
      .as[CaptionedMedia]
      .mapPartitions { it =>
        it.map { r =>
          val cap = if (r.caption == null) "" else r.caption
          val pay = if (r.payload == null) Array.emptyByteArray else r.payload
          AlignPair(r.media_id, cap.length,
            StubCodec.features(pay, dim),
            StubCodec.features(cap.getBytes(StandardCharsets.UTF_8), dim))
        }
      }
      .toDF()
  }

  /** Exact 6-dp scaled-long centered cosine of two float-array columns
    * (the q_v15/q_v16 integer-compare idiom: round to 6 dp, scale, cast —
    * so threshold comparisons are integer-exact and DuckDB-replayable).
    * Zero-variance vectors (empty/constant payloads) score 0. The two
    * arrays must share one width ([[captionFeaturePairs]] guarantees it;
    * zip_with on mismatched widths would null-pad and null the score).
    */
  def alignmentScore6(a: String, b: String): String =
    Dedup.letBind(
      s"aggregate($a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)) / size($a)", "ma",
      Dedup.letBind(
        s"aggregate($b, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)) / size($b)", "mb",
        Dedup.letBind(
          s"""aggregate(zip_with($a, $b,
             |  (x, y) -> (CAST(x AS DOUBLE) - ma) * (CAST(y AS DOUBLE) - mb)),
             |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin, "num",
          Dedup.letBind(
            s"""aggregate($a, CAST(0 AS DOUBLE),
               |  (acc, x) -> acc + (CAST(x AS DOUBLE) - ma) * (CAST(x AS DOUBLE) - ma))""".stripMargin, "da2",
            Dedup.letBind(
              s"""aggregate($b, CAST(0 AS DOUBLE),
                 |  (acc, x) -> acc + (CAST(x AS DOUBLE) - mb) * (CAST(x AS DOUBLE) - mb))""".stripMargin, "db2",
              """CAST(round(round(IF(da2 = CAST(0 AS DOUBLE) OR db2 = CAST(0 AS DOUBLE),
                |  CAST(0 AS DOUBLE), num / (sqrt(da2) * sqrt(db2))), 6) * 1000000)
                |AS BIGINT)""".stripMargin)))))

  /** Per-pair alignment card: score each (payload, caption) pair and flag
    * the keepers at `floor6` (a 6-dp scaled-long floor — 200000 = 0.2).
    * The card ships to the dataset audit; [[Curation]] uses the flag as
    * its optional multimodal gate.
    */
  def captionAlign(df: DataFrame, idCol: String, payloadCol: String,
                   captionCol: String, floor6: Long, dim: Int = 16): DataFrame =
    captionFeaturePairs(df, idCol, payloadCol, captionCol, dim)
      .withColumn("align6", expr(alignmentScore6("media_feats", "caption_feats")))
      .withColumn("aligned", (col("align6") >= floor6).cast("int"))
      .select("media_id", "caption_chars", "align6", "aligned")

  /** "Resize": renormalize a feature vector to a new width by linear
    * bucket re-averaging — the plumbing twin of image resizing.
    */
  def resizeFeatures(features: Dataset[MediaFeatures], newDim: Int): DataFrame = {
    features.toDF().withColumn("features",
      expr(
        s"""transform(sequence(0, ${newDim - 1}), i ->
           |  aggregate(slice(features, CAST(i * size(features) / $newDim AS INT) + 1,
           |                  greatest(1, CAST(size(features) / $newDim AS INT))),
           |            CAST(0.0 AS DOUBLE), (acc, x) -> acc + x,
           |            acc -> CAST(acc / greatest(1, CAST(size(features) / $newDim AS INT)) AS FLOAT)))""".stripMargin))
  }

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** One voice-activity segment of [[pcmVad]]: consecutive speech frames
    * merged, with the EXACT integer energy mass (sum over the segment's
    * frames of Σ sample² — LONG arithmetic throughout, no float, so the
    * card is bit-replayable by any engine). Frame indexes are inclusive. */
  case class VadSegment(id: Long, seg_idx: Int, start_frame: Int,
                        end_frame: Int, n_frames: Int, energy_sum: Long)

  /** Voice-activity detection over RAW PCM (signed 16-bit little-endian
    * mono) binary columns — real DSP with no codec dependency, unlike the
    * stubbed image/video decode paths: frame the samples
    * (`samplesPerFrame` each; a trailing partial frame is dropped),
    * compute each frame's exact integer energy Σ sample² in LONG
    * (max 2^31·spf per frame — overflow-free for any real frame size),
    * mark frames with energy ≥ `energyFloor` as speech, and merge
    * consecutive speech frames into segments.
    *
    * Scale shape: one typed partition-preserving pass, per-row work
    * linear in audio length, output segments-sized — the same posture as
    * [[decodeFeatures]]/[[sampleFrames]]; at 100 TB this rides the scan
    * of the audio lake. Integer energies make the speech/silence boundary
    * exact, so the q_m8 oracle derives expected segments analytically
    * from its planted loud/quiet frame pattern.
    */
  /** One parsed WAV container: header fields + the raw PCM payload, or a
    * `valid = false` row naming the defect — malformed audio surfaces as
    * DATA, never a task failure (the [[ImageCodec.decodeImages]]
    * totality contract). */
  case class WavRecord(id: Long, valid: Boolean, reason: String,
                       sample_rate: Int, channels: Int, bits: Int,
                       n_samples: Long, pcm: Array[Byte])

  /** Parse RIFF/WAVE containers to typed header fields + PCM bytes — the
    * real audio container format on top of [[pcmVad]]'s raw-PCM DSP (the
    * image branch's BMP/PNG/JPEG decode has [[ImageCodec]]; this is the
    * audio twin; both are pure JDK byte arithmetic, offline). Walks the
    * chunk list (fmt before data; unknown chunks skipped; RIFF's
    * even-byte padding honored), requires PCM format 1 at 16 bits for
    * extraction, and surfaces every defect class as a `valid = false`
    * row with a stable reason. One typed partition-preserving pass;
    * payloads never visit the driver.
    *
    * WAV layout (public, Microsoft/IBM RIFF spec): `"RIFF" size "WAVE"`
    * then chunks of `id(4) size(4 LE) payload(size, padded to even)`;
    * `"fmt "` carries (format, channels, sampleRate, byteRate,
    * blockAlign, bitsPerSample) little-endian; `"data"` carries PCM. */
  def parseWav(df: DataFrame, idCol: String, payloadCol: String): Dataset[WavRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        def invalid(reason: String) =
          WavRecord(id, valid = false, reason, 0, 0, 0, 0L, Array.emptyByteArray)
        val b = if (payload == null) Array.emptyByteArray else payload
        def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        def tag(o: Int): String =
          new String(b, o, 4, StandardCharsets.US_ASCII)
        if (b.length < 12) invalid("truncated-preamble")
        else if (tag(0) != "RIFF") invalid("bad-magic")
        else if (tag(8) != "WAVE") invalid("not-wave")
        else {
          var off = 12
          var fmtSeen = false
          var format = 0
          var channels = 0
          var rate = 0
          var bits = 0
          var pcm: Array[Byte] = null
          var defect: String = null
          while (defect == null && pcm == null && off + 8 <= b.length) {
            val id4 = tag(off)
            val size = u32(off + 4)
            val body = off + 8
            if (size < 0 || body + size > b.length) defect = "chunk-overruns-file"
            else id4 match {
              case "fmt " =>
                if (size < 16) defect = "fmt-too-short"
                else {
                  format = u16(body)
                  channels = u16(body + 2)
                  rate = u32(body + 4).toInt
                  bits = u16(body + 14)
                  fmtSeen = true
                }
              case "data" =>
                if (!fmtSeen) defect = "data-before-fmt"
                else pcm = java.util.Arrays.copyOfRange(b, body, (body + size).toInt)
              case _ => () // LIST/INFO/junk: skipped
            }
            // RIFF rule: chunk payloads pad to even length
            off = body + size.toInt + (size.toInt & 1)
          }
          if (defect != null) invalid(defect)
          else if (pcm == null) invalid(if (fmtSeen) "no-data-chunk" else "no-fmt-chunk")
          else if (format != 1) invalid("not-pcm")
          else if (bits != 16) invalid("unsupported-bits")
          else if (channels < 1) invalid("bad-channels")
          else WavRecord(id, valid = true, "", rate, channels, bits,
            pcm.length / 2L / channels, pcm)
        }
      }
  }

  /** Build canonical 16-bit PCM WAV bytes — the fixture/oracle writer
    * ([[ImageCodec.grayBmp]]'s audio twin). `extraChunks` are inserted
    * between `fmt ` and `data` (odd-sized payloads get the RIFF pad). */
  def pcmWav(sampleRate: Int, channels: Int, pcm: Array[Byte],
             extraChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1)
    val extraLen = extraChunks.map { case (_, d) => 8 + d.length + (d.length & 1) }.sum
    val riffSize = 4 + 24 + extraLen + 8 + pcm.length + (pcm.length & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(riffSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16.toShort)
    extraChunks.foreach { case (id4, d) =>
      require(id4.length == 4, s"chunk id must be 4 chars: $id4")
      out.put(id4.getBytes(StandardCharsets.US_ASCII)).putInt(d.length).put(d)
      if ((d.length & 1) == 1) out.put(0.toByte)
    }
    out.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(pcm.length).put(pcm)
    if ((pcm.length & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Parsed MP4 (ISO-BMFF) container metadata, or a `valid = false` row
    * naming the defect — the [[parseWav]] totality contract for the
    * VIDEO branch. Decode stays honestly out of scope (no codec ships
    * offline); the container walk is what a 100 TB video lake needs for
    * inventory/dedup/sampling decisions (brand, timescale, duration,
    * box census) and it is pure byte arithmetic. */
  case class Mp4Meta(id: Long, valid: Boolean, reason: String,
                     major_brand: String, timescale: Long, duration: Long,
                     n_top_boxes: Int)

  /** Walk an MP4's top-level box list (ISO 14496-12: `size(4 BE)
    * type(4)`, size 1 → 64-bit largesize, size 0 → to-EOF) and `moov`'s
    * children for `mvhd` (v0 and v1 layouts); overruns, truncations and
    * malformed mvhd surface as rows, never task failures. One typed
    * partition-preserving pass. */
  def parseMp4Meta(df: DataFrame, idCol: String,
                   payloadCol: String): Dataset[Mp4Meta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        def invalid(reason: String) = Mp4Meta(id, valid = false, reason, "", 0L, 0L, 0)
        val b = if (payload == null) Array.emptyByteArray else payload
        def u32(o: Long): Long = ((b(o.toInt) & 0xffL) << 24) |
          ((b(o.toInt + 1) & 0xffL) << 16) | ((b(o.toInt + 2) & 0xffL) << 8) |
          (b(o.toInt + 3) & 0xffL)
        def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
        def tag(o: Long): String =
          new String(b, o.toInt, 4, StandardCharsets.US_ASCII)
        var off = 0L
        var nTop = 0
        var brand = ""
        var ts = 0L
        var dur = -1L
        var defect: String = null
        while (defect == null && off < b.length) {
          if (b.length - off < 8) defect = "truncated-box-header"
          else {
            val size0 = u32(off)
            var hdr = 8L
            var size = size0
            if (size0 == 1L) {
              if (b.length - off < 16) { defect = "truncated-box-header" }
              else { size = u64(off + 8); hdr = 16L }
            } else if (size0 == 0L) size = b.length - off
            if (defect == null) {
              if (size < hdr || off + size > b.length) defect = "box-overruns-file"
              else {
                nTop += 1
                tag(off + 4) match {
                  case "ftyp" =>
                    if (size >= hdr + 4) brand = tag(off + hdr)
                    else defect = "ftyp-too-short"
                  case "moov" =>
                    var c = off + hdr
                    val end = off + size
                    while (defect == null && dur < 0 && c < end) {
                      if (end - c < 8) defect = "truncated-box-header"
                      else {
                        val cs0 = u32(c)
                        var chdr = 8L
                        var cs = cs0
                        if (cs0 == 1L) {
                          if (end - c < 16) defect = "truncated-box-header"
                          else { cs = u64(c + 8); chdr = 16L }
                        } else if (cs0 == 0L) cs = end - c
                        if (defect == null) {
                          if (cs < chdr || c + cs > end) defect = "box-overruns-file"
                          else {
                            if (tag(c + 4) == "mvhd") {
                              val v = b((c + chdr).toInt) & 0xff
                              if (v == 0 && cs >= chdr + 4 + 16) {
                                ts = u32(c + chdr + 4 + 8)
                                dur = u32(c + chdr + 4 + 12)
                              } else if (v == 1 && cs >= chdr + 4 + 28) {
                                ts = u32(c + chdr + 4 + 16)
                                dur = u64(c + chdr + 4 + 20)
                              } else defect = "mvhd-malformed"
                            }
                            c += cs
                          }
                        }
                      }
                    }
                  case _ => () // free/mdat/skip: censused, not descended
                }
                off += size
              }
            }
          }
        }
        if (defect != null) invalid(defect)
        else if (brand.isEmpty) invalid("no-ftyp")
        else if (dur < 0) invalid("no-mvhd")
        else Mp4Meta(id, valid = true, "", brand, ts, dur, nTop)
      }
  }

  /** Build canonical MP4 metadata bytes (ftyp + free + moov(free, mvhd) +
    * mdat) — the fixture/oracle writer completing the [[pcmWav]] /
    * [[ImageCodec.grayBmp]] container-builder trio. `mvhdV1` writes the
    * 64-bit-duration layout. */
  def mp4Meta(brand: String, timescale: Long, duration: Long,
              mvhdV1: Boolean = false, mdatBytes: Int = 16): Array[Byte] = {
    require(brand.length == 4, s"brand must be 4 chars: $brand")
    def be32(v: Long) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++
        typ.getBytes(StandardCharsets.US_ASCII) ++ payload
    val ftyp = box("ftyp",
      brand.getBytes(StandardCharsets.US_ASCII) ++ be32(0L) ++
        "iso2".getBytes(StandardCharsets.US_ASCII))
    val mvhd =
      if (mvhdV1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0L) ++
        be64(0L) ++ be32(timescale) ++ be64(duration) ++ new Array[Byte](80))
      else box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0L) ++ be32(0L) ++
        be32(timescale) ++ be32(duration) ++ new Array[Byte](80))
    val moov = box("moov", box("free", new Array[Byte](2)) ++ mvhd)
    ftyp ++ box("free", new Array[Byte](3)) ++ moov ++
      box("mdat", new Array[Byte](mdatBytes))
  }

  def pcmVad(df: DataFrame, idCol: String, pcmCol: String,
             samplesPerFrame: Int, energyFloor: Long): Dataset[VadSegment] = {
    require(samplesPerFrame >= 1, s"samplesPerFrame >= 1, got $samplesPerFrame")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(pcmCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, pcm) =>
        val bytes = if (pcm == null) Array.emptyByteArray else pcm
        val spf = samplesPerFrame
        val nFrames = bytes.length / (2 * spf)
        val energies = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var i = f * 2 * spf
          val end = i + 2 * spf
          while (i < end) {
            // s16le: low byte unsigned, high byte sign-carrying
            val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
            e += s * s
            i += 2
          }
          energies(f) = e
          f += 1
        }
        val segs = scala.collection.mutable.ArrayBuffer.empty[VadSegment]
        var segStart = -1
        var segEnergy = 0L
        f = 0
        while (f <= nFrames) { // one past the end flushes a trailing segment
          if (f < nFrames && energies(f) >= energyFloor) {
            if (segStart < 0) { segStart = f; segEnergy = 0L }
            segEnergy += energies(f)
          } else if (segStart >= 0) {
            segs += VadSegment(id, segs.length, segStart, f - 1,
              f - segStart, segEnergy)
            segStart = -1
          }
          f += 1
        }
        segs
      }
  }
}
