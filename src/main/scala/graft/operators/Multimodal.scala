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
          // rate is an unsigned 32-bit field: 0 and > Int.MaxValue (which
          // wrapped negative through toInt) are corrupt headers, and a
          // zero rate would crash downstream rate arithmetic
          // ([[pcmMonoResample]]'s gcd/division) instead of quarantining
          else if (rate < 1) invalid("bad-rate")
          else WavRecord(id, valid = true, "", rate, channels, bits,
            pcm.length / 2L / channels, pcm)
        }
      }
  }

  /** Mono 16-bit PCM at a normalized rate, or the propagated parse
    * defect — [[pcmMonoResample]]'s output row. */
  case class ResampledPcm(id: Long, valid: Boolean, reason: String,
                          sample_rate: Int, n_samples: Long, pcm: Array[Byte])

  /** Channel mixdown + rational-factor resample — the speech-model prep
    * step on the WAV branch (r14 VERDICT #8): every model-input pipeline
    * normalizes to mono at one rate (16 kHz for speech) before
    * featurization. INTEGER-EXACT s16 arithmetic throughout, so the
    * driver oracle replays it bit-for-bit:
    *
    *   - mixdown: `mono[i] = floorDiv(sum over channels, channels)` —
    *     the mean of in-range s16 samples, floor-rounded; stays inside
    *     [-32768, 32767] by construction (no clipping stage needed);
    *   - resample src→dst with `up = dst/g, down = src/g`
    *     (g = gcd): output j sits at rational source position
    *     `j·down/up`; `out[j] = floorDiv(mono[i0]·(up-rem) +
    *     mono[i0+1]·rem, up)` with `i0 = (j·down)/up`,
    *     `rem = (j·down) mod up` — exact linear interpolation in
    *     integers (pure decimation when up = 1: `out[j] = mono[j·down]`).
    *     `n_out = (n_in-1)·up/down + 1` (every output position ≤ the
    *     last input sample). Interpolation between in-range endpoints
    *     never leaves the s16 range.
    *
    * Anti-aliasing (r15 VERDICT #5 — the honest completion of the r15
    * "no low-pass" documented gap): `antiAliasTaps > 0` composes an
    * INTEGER windowed-sinc FIR in front of the rational core whenever the
    * call actually DOWN-samples (upsampling creates no aliases; the
    * filter is skipped, making the flag a no-op there). Coefficients are
    * [[antiAliasFir]]'s Q15 integers and the convolution is exact LONG
    * arithmetic with zero-padded edges —
    * `filtered[i] = floorDiv(Σ_k mono[i+k−M]·c[k], Σ_k c[k])` — so the
    * whole chain stays bit-replayable by an external engine that receives
    * the coefficient table (the q_m19 oracle interpolates it as SQL
    * literals and replays the convolution row-for-row). Without the flag
    * behaviour is byte-identical to r15 (q_m17's pin). Default taps for
    * speech-prep decimation: 63 (≈ −50 dB stopband from the Hamming
    * window; a 24 kHz tone decimated 48k→16k aliases to FULL amplitude
    * unfiltered and to < 1% through the filter — MultimodalSpec's
    * receipt).
    *
    * Honest scope: linear interpolation between filtered samples remains
    * the interpolation kernel (a polyphase FIR at the interpolation
    * positions would be the audiophile completion). Row-local typed pass,
    * payloads never visit the driver. */
  def pcmMonoResample(wavs: Dataset[WavRecord], dstRate: Int,
                      antiAliasTaps: Int = 0): Dataset[ResampledPcm] = {
    require(dstRate >= 1)
    require(antiAliasTaps == 0 || (antiAliasTaps >= 3 && antiAliasTaps % 2 == 1),
      s"antiAliasTaps must be 0 (off) or an odd count >= 3, got $antiAliasTaps")
    val spark = wavs.sparkSession
    import spark.implicits._
    wavs.map { w =>
      if (!w.valid)
        ResampledPcm(w.id, valid = false, w.reason, 0, 0L, Array.emptyByteArray)
      else if (w.sample_rate < 1) // hand-built record bypassing parseWav
        ResampledPcm(w.id, valid = false, "bad-rate", 0, 0L, Array.emptyByteArray)
      else {
        val ch = w.channels
        val n = w.n_samples.toInt
        val src = w.pcm
        def s16(i: Int, c: Int): Int = {
          val o = (i * ch + c) * 2
          ((src(o) & 0xff) | (src(o + 1) << 8)).toShort.toInt
        }
        val mixed = new Array[Int](n)
        var i = 0
        while (i < n) {
          var sum = 0L
          var c = 0
          while (c < ch) { sum += s16(i, c); c += 1 }
          mixed(i) = Math.floorDiv(sum, ch.toLong).toInt
          i += 1
        }
        val mono =
          if (antiAliasTaps == 0 || dstRate >= w.sample_rate) mixed
          else {
            val cs = firCache.computeIfAbsent(
              (w.sample_rate, dstRate, antiAliasTaps),
              k => antiAliasFir(k._1, k._2, k._3))
            val s = cs.map(_.toLong).sum
            val m = (antiAliasTaps - 1) / 2
            val f = new Array[Int](n)
            var j = 0
            while (j < n) {
              var acc = 0L
              var k = 0
              while (k < antiAliasTaps) {
                val p = j + k - m
                if (p >= 0 && p < n) acc += mixed(p).toLong * cs(k)
                k += 1
              }
              // saturate: windowed-sinc ringing can overshoot a full-scale
              // edge by ~9% (Gibbs); wrap-around would be corruption, the
              // clamp is the deterministic (oracle: LEAST/GREATEST) choice
              val v = Math.floorDiv(acc, s)
              f(j) = math.max(-32768L, math.min(32767L, v)).toInt
              j += 1
            }
            f
          }
        val g = java.math.BigInteger.valueOf(w.sample_rate)
          .gcd(java.math.BigInteger.valueOf(dstRate)).longValueExact()
        val up = (dstRate / g).toInt
        val down = (w.sample_rate / g).toInt
        val nOut = if (n == 0) 0 else ((n - 1).toLong * up / down + 1).toInt
        val out = new Array[Byte](nOut * 2)
        var j = 0
        while (j < nOut) {
          val num = j.toLong * down
          val i0 = (num / up).toInt
          val rem = (num % up).toInt
          val v =
            if (rem == 0) mono(i0)
            else Math.floorDiv(
              mono(i0).toLong * (up - rem) + mono(i0 + 1).toLong * rem,
              up.toLong).toInt
          out(j * 2) = (v & 0xff).toByte
          out(j * 2 + 1) = ((v >> 8) & 0xff).toByte
          j += 1
        }
        ResampledPcm(w.id, valid = true, "", dstRate, nOut.toLong, out)
      }
    }
  }

  /** Q15 integer coefficients of the anti-alias FIR [[pcmMonoResample]]
    * composes before down-sampling: a Hamming-windowed sinc low-pass with
    * cutoff at the DESTINATION Nyquist, `taps` odd. With
    * `r = dstRate / (2·srcRate)` (the cutoff as a fraction of the source
    * rate) and `M = (taps−1)/2`:
    *
    *   `h(k) = 2r·sinc(2r·(k−M)) · (0.54 − 0.46·cos(2πk/(taps−1)))`
    *   `c(k) = round(h(k)·32768)`
    *
    * The convolution divides by `Σc(k)`, so DC gain is exactly 1
    * regardless of quantization. The doubles here run ONCE per geometry
    * on the driver/task — the per-sample path is pure LONG arithmetic —
    * and external replay (the q_m19 oracle) takes the integers as
    * literals rather than re-deriving trig, so engine ulp differences
    * can't desynchronize the replay. */
  /** Per-executor coefficient cache keyed by (src, dst, taps) — the
    * PigeonholeGeometry.get discipline: the trig runs once per geometry
    * per JVM, the per-row path is table lookups only. */
  private val firCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Int]]()

  def antiAliasFir(srcRate: Int, dstRate: Int, taps: Int): Array[Int] = {
    require(taps >= 3 && taps % 2 == 1, s"taps must be odd >= 3, got $taps")
    require(srcRate > dstRate && dstRate >= 1,
      s"anti-alias FIR is a down-sampling filter: src=$srcRate dst=$dstRate")
    val r = dstRate.toDouble / (2.0 * srcRate)
    val m = (taps - 1) / 2
    val out = new Array[Int](taps)
    var k = 0
    while (k < taps) {
      val x = 2.0 * r * (k - m)
      val sinc = if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
      val win = 0.54 - 0.46 * math.cos(2.0 * math.Pi * k / (taps - 1))
      out(k) = math.round(2.0 * r * sinc * win * 32768.0).toInt
      k += 1
    }
    require(out.map(_.toLong).sum > 0, "degenerate FIR: non-positive gain")
    out
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

  // ------------------------------------------------------ IMA ADPCM

  /** IMA/DVI ADPCM quantizer step table (89 entries) and index-adaption
    * table — the public spec constants (IMA Digital Audio Pack, 1992;
    * identical in the MS WAVE_FORMAT_IMA_ADPCM registration). These
    * integers ARE the contract: decode is a pure integer state machine
    * over them, so an external engine replays it bit-for-bit from the
    * same literals (the q_m19 FIR-coefficient discipline). */
  private[operators] val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[operators] val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one nibble against (predictor, stepIndex) — the IMA update
    * rule, integer-exact:
    * `diff = step>>3 (+ step if b2) (+ step>>1 if b1) (+ step>>2 if b0)`,
    * sign bit b3 subtracts; predictor clamps to s16; index adapts by the
    * table and clamps to [0, 88]. Returns (sample, newIndex). */
  @inline private def adpcmStep(nibble: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = AdpcmStepTable(idx)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + AdpcmIndexTable(nibble)))
    (p, i)
  }

  /** Decode an IMA ADPCM block body (packed nibbles, LOW nibble first —
    * the IMA/WAV packing order) from the given initial state. The block
    * header's predictor is sample 0; each data byte yields two more. */
  private[operators] def adpcmDecodeCore(data: Array[Byte], from: Int,
                                         until: Int, pred0: Int,
                                         idx0: Int): Array[Short] = {
    val n = (until - from) * 2 + 1
    val out = new Array[Short](n)
    out(0) = pred0.toShort
    var pred = pred0
    var idx = idx0
    var i = from
    var o = 1
    while (i < until) {
      val b = data(i) & 0xff
      val (s1, i1) = adpcmStep(b & 0xf, pred, idx)
      pred = s1; idx = i1; out(o) = s1.toShort
      val (s2, i2) = adpcmStep((b >> 4) & 0xf, pred, idx)
      pred = s2; idx = i2; out(o + 1) = s2.toShort
      i += 1; o += 2
    }
    out
  }

  /** Encode s16 samples as one IMA ADPCM block: sample 0 becomes the
    * block header predictor; each later sample quantizes its delta
    * through the mirrored state machine (encoder and decoder run the
    * SAME reconstruction, so state never drifts — the property the
    * round-trip spec pins). Returns (headerPredictor, headerIndex,
    * packed nibble bytes); each block is self-contained — its header
    * restarts the decoder state, so multi-block encodes need no state
    * threading. Sample count must be odd (header + 2 per byte — the
    * WAV samplesPerBlock shape). */
  private[operators] def adpcmEncodeBlock(samples: Array[Short],
                                          idx0: Int): (Int, Int, Array[Byte]) = {
    require(samples.nonEmpty && samples.length % 2 == 1,
      s"block sample count must be odd, got ${samples.length}")
    val data = new Array[Byte]((samples.length - 1) / 2)
    var pred = samples(0).toInt
    var idx = idx0
    var s = 1
    var o = 0
    while (s < samples.length) {
      def nibbleFor(target: Int): Int = {
        val step = AdpcmStepTable(idx)
        var delta = target - pred
        var nib = 0
        if (delta < 0) { nib = 8; delta = -delta }
        if (delta >= step) { nib |= 4; delta -= step }
        if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) { nib |= 1 }
        nib
      }
      val lo = nibbleFor(samples(s).toInt)
      val (p1, i1) = adpcmStep(lo, pred, idx)
      pred = p1; idx = i1
      val hi = nibbleFor(samples(s + 1).toInt)
      val (p2, i2) = adpcmStep(hi, pred, idx)
      pred = p2; idx = i2
      data(o) = (lo | (hi << 4)).toByte
      s += 2; o += 1
    }
    (samples(0).toInt, idx0, data)
  }

  /** Build a mono IMA-ADPCM WAV (WAVE_FORMAT_IMA_ADPCM = 0x11): fmt
    * chunk with the 2-byte extension carrying samplesPerBlock, data
    * chunk of fixed-size blocks, each `4-byte header (predictor s16 LE,
    * index u8, reserved 0) + packed nibbles`. All blocks must share one
    * nibble-payload size (`blockAlign = 4 + payload`). */
  def adpcmWav(sampleRate: Int,
               blocks: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(blocks.nonEmpty)
    val payloadLen = blocks.head._3.length
    require(blocks.forall(_._3.length == payloadLen),
      "all ADPCM blocks must share one payload size")
    val blockAlign = 4 + payloadLen
    val samplesPerBlock = payloadLen * 2 + 1
    val dataLen = blocks.size * blockAlign
    val riffSize = 4 + (8 + 20) + (8 + dataLen + (dataLen & 1))
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(riffSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(20)
      .putShort(0x11.toShort).putShort(1.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4.toShort)
      .putShort(2.toShort).putShort(samplesPerBlock.toShort)
    out.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    blocks.foreach { case (pred, idx, data) =>
      require(idx >= 0 && idx <= 88, s"header index out of range: $idx")
      out.putShort(pred.toShort).put(idx.toByte).put(0.toByte).put(data)
    }
    if ((dataLen & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Parse + DECODE mono IMA-ADPCM WAVs to 16-bit PCM [[WavRecord]]s —
    * the first real COMPRESSED-audio decode path (r16 VERDICT #8,
    * closing part of the "containers walked, codec missing" gap):
    * output rows are bit-identical in shape to [[parseWav]]'s, so the
    * whole downstream PCM pipeline ([[pcmVad]], [[pcmMonoResample]],
    * the FIR chain) composes unchanged on compressed inputs. Container
    * walk honors the RIFF rules of [[parseWav]]; every defect class
    * (bad magic, wrong format tag, truncated block header, stereo,
    * out-of-range block index) is a `valid = false` row, never a task
    * failure. Decode is the integer state machine above — 4 bits/sample
    * in, s16 out, one partition-preserving typed pass, payloads never
    * on the driver. */
  def parseWavAdpcm(df: DataFrame, idCol: String,
                    payloadCol: String): Dataset[WavRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        def invalid(reason: String) =
          WavRecord(id, valid = false, reason, 0, 0, 0, 0L, Array.emptyByteArray)
        val b = if (payload == null) Array.emptyByteArray else payload
        def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def s16(o: Int): Int = u16(o).toShort.toInt
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
          var blockAlign = 0
          var dataOff = -1
          var dataLen = 0
          var defect: String = null
          while (defect == null && dataOff < 0 && off + 8 <= b.length) {
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
                  blockAlign = u16(body + 12)
                  bits = u16(body + 14)
                  fmtSeen = true
                }
              case "data" =>
                if (!fmtSeen) defect = "data-before-fmt"
                else { dataOff = body; dataLen = size.toInt }
              case _ => ()
            }
            off = body + size.toInt + (size.toInt & 1)
          }
          if (defect != null) invalid(defect)
          else if (dataOff < 0) invalid(if (fmtSeen) "no-data-chunk" else "no-fmt-chunk")
          else if (format != 0x11) invalid("not-ima-adpcm")
          else if (bits != 4) invalid("unsupported-bits")
          else if (channels != 1) invalid("unsupported-channels")
          else if (rate < 1) invalid("bad-rate")
          else if (blockAlign < 5) invalid("bad-block-align")
          else {
            // decode block by block. A PARTIAL FINAL block (data length
            // not a blockAlign multiple) is the WAV convention for a
            // stream whose true sample count ends mid-block — it decodes
            // to its shorter sample run; only a fragment too small for a
            // block header (< 5 bytes) quarantines, along with any
            // malformed header (a half-decoded stream there is worse
            // than none)
            val outBlocks = Seq.newBuilder[Array[Short]]
            var pos = dataOff
            val end = dataOff + dataLen
            while (defect == null && pos < end) {
              if (end - pos < 5) defect = "truncated-block-header"
              else {
                val pred0 = s16(pos)
                val idx0 = b(pos + 2) & 0xff
                if (idx0 > 88) defect = "block-index-out-of-range"
                else {
                  val until = math.min(pos + blockAlign, end)
                  outBlocks += adpcmDecodeCore(b, pos + 4, until, pred0, idx0)
                  pos += blockAlign
                }
              }
            }
            if (defect != null) invalid(defect)
            else {
              val all = outBlocks.result().flatten.toArray
              val pcm = java.nio.ByteBuffer.allocate(all.length * 2)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              all.foreach(pcm.putShort)
              WavRecord(id, valid = true, "", rate, 1, 16, all.length.toLong,
                pcm.array())
            }
          }
        }
      }
  }

  // ------------------------------------------------------ G.711 companding

  /** G.711 µ-law byte → s16 (ITU-T G.711, public): complement, split
    * into sign/segment/mantissa, expand `((man·8 + 0x84) << seg) − 0x84`.
    * Pure integer — one table-free expression per sample. */
  @inline private[operators] def ulawToPcm(b: Byte): Int = {
    val u = (~b) & 0xff
    val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law byte → s16: even-bit inversion (XOR 0x55), then the
    * segment expansion; sign bit SET means positive (the A-law
    * convention, opposite µ-law's). */
  @inline private[operators] def alawToPcm(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val man = (a & 0x0f) << 4
    val seg = (a >> 4) & 0x07
    val mag =
      if (seg == 0) man + 8
      else (man + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Parse + decode G.711 companded WAVs (WAVE_FORMAT_ALAW = 6,
    * WAVE_FORMAT_MULAW = 7; 8 bits/sample, the telephony/callcenter
    * archive format) to 16-bit PCM [[WavRecord]]s — the second real
    * compressed-audio path beside [[parseWavAdpcm]], and the simpler
    * one: G.711 is STATELESS (one byte → one sample), so decode is a
    * row-local table-free expression and any channel count passes
    * through (bytes interleave exactly like PCM frames). Output
    * composes into [[pcmMonoResample]]/[[pcmVad]] unchanged. */
  def parseWavG711(df: DataFrame, idCol: String,
                   payloadCol: String): Dataset[WavRecord] = {
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
          var dataOff = -1
          var dataLen = 0
          var defect: String = null
          while (defect == null && dataOff < 0 && off + 8 <= b.length) {
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
                else { dataOff = body; dataLen = size.toInt }
              case _ => ()
            }
            off = body + size.toInt + (size.toInt & 1)
          }
          if (defect != null) invalid(defect)
          else if (dataOff < 0) invalid(if (fmtSeen) "no-data-chunk" else "no-fmt-chunk")
          else if (format != 6 && format != 7) invalid("not-g711")
          else if (bits != 8) invalid("unsupported-bits")
          else if (channels < 1) invalid("bad-channels")
          else if (rate < 1) invalid("bad-rate")
          // a data length not divisible by the channel count is a torn
          // final frame: n_samples and the decoded buffer would disagree
          // (the parseWav PCM invariant consumers iterate by)
          else if (dataLen % channels != 0) invalid("partial-frame")
          else {
            val pcm = java.nio.ByteBuffer.allocate(dataLen * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var i = dataOff
            val end = dataOff + dataLen
            while (i < end) {
              val s = if (format == 7) ulawToPcm(b(i)) else alawToPcm(b(i))
              pcm.putShort(s.toShort)
              i += 1
            }
            WavRecord(id, valid = true, "", rate, channels, 16,
              dataLen.toLong / channels, pcm.array())
          }
        }
      }
  }

  /** Build a G.711 WAV container (format 6 = A-law, 7 = µ-law; 8-bit). */
  def g711Wav(sampleRate: Int, channels: Int, format: Int,
              bytes: Array[Byte]): Array[Byte] = {
    require(format == 6 || format == 7, s"format must be 6 or 7: $format")
    require(channels >= 1 && sampleRate >= 1)
    val riffSize = 4 + (8 + 18) + 8 + bytes.length + (bytes.length & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(riffSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(18)
      .putShort(format.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels)
      .putShort(channels.toShort).putShort(8.toShort)
      .putShort(0.toShort) // cbSize = 0
    out.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(bytes.length)
      .put(bytes)
    if ((bytes.length & 1) == 1) out.put(0.toByte)
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

  // ------------------------------------------------------------- AVI

  /** One video frame pulled from an AVI container (or a `valid = false`
    * quarantine row for the whole file): `fourcc` is the stream
    * handler/compression tag — `"DIB "` frames carry UNCOMPRESSED
    * bottom-up BGR rows (rows padded to 4 bytes, exactly the BMP pixel
    * array), `"MJPG"` frames carry standalone JPEGs that feed
    * [[ImageCodec.decodeImages]] unchanged. */
  case class AviFrame(id: Long, valid: Boolean, reason: String,
                      frame_index: Int, width: Int, height: Int,
                      fourcc: String, n_frames: Int, payload: Array[Byte])

  /** Walk AVI containers (RIFF 'AVI ' — the public Microsoft/OpenDML
    * layout) and emit ONE ROW PER VIDEO FRAME — the first real video
    * FRAME-EXTRACTION path beside [[parseMp4Meta]]'s metadata walk:
    * `hdrl` gives dimensions + the stream's compression tag (from the
    * strf BITMAPINFOHEADER; 0 = DIB uncompressed, else the fourcc),
    * `movi` yields the `..db`/`..dc` frame chunks in stream order
    * (nested `rec ` LISTs honored). DIB frames are decodable by pure
    * byte arithmetic downstream; MJPG frames compose into the REAL
    * JPEG decoder. Every defect class (bad magic, missing hdrl/movi,
    * chunk overrun mid-frame) quarantines the FILE as one
    * `valid = false` row — the [[parseWav]] totality contract. One
    * typed flatMap pass; payloads never visit the driver. */
  def aviFrames(df: DataFrame, idCol: String,
                payloadCol: String): Dataset[AviFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        def invalid(reason: String) = Seq(AviFrame(id, valid = false,
          reason, -1, 0, 0, "", 0, Array.emptyByteArray))
        val b = if (payload == null) Array.emptyByteArray else payload
        def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        def tag(o: Int): String =
          new String(b, o, 4, StandardCharsets.US_ASCII)
        if (b.length < 12) invalid("truncated-preamble")
        else if (tag(0) != "RIFF") invalid("bad-magic")
        else if (tag(8) != "AVI ") invalid("not-avi")
        else {
          var width = 0
          var height = 0
          var fourcc = ""
          var hdrlSeen = false
          var moviSeen = false
          var defect: String = null
          val frames = Seq.newBuilder[Array[Byte]]
          // walk a chunk run [from, until); LISTs recurse (hdrl for the
          // headers, movi/rec for frames); other chunks skip
          def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
            var off = from
            while (defect == null && off + 8 <= until) {
              val id4 = tag(off)
              val size = u32(off + 4)
              val body = off + 8
              if (size < 0 || body + size > until) defect = "chunk-overruns-file"
              else if (id4 == "LIST") {
                if (size < 4) defect = "list-too-short"
                else {
                  val listType = tag(body)
                  if (listType == "hdrl") { hdrlSeen = true; walk(body + 4, body + size.toInt, inMovi = false) }
                  else if (listType == "strl") walk(body + 4, body + size.toInt, inMovi = false)
                  else if (listType == "movi") { moviSeen = true; walk(body + 4, body + size.toInt, inMovi = true) }
                  else if (listType == "rec ") walk(body + 4, body + size.toInt, inMovi)
                  // other lists (odml, INFO) skipped whole
                }
              } else if (id4 == "strf" && size >= 40) {
                // BITMAPINFOHEADER: biWidth @+4, biHeight @+8,
                // biCompression @+16 (0 = BI_RGB -> "DIB ")
                width = u32(body + 4).toInt
                height = u32(body + 8).toInt
                val comp = u32(body + 16)
                fourcc = if (comp == 0L) "DIB " else tag(body + 16)
              } else if (inMovi && id4.length == 4 &&
                         id4(0).isDigit && id4(1).isDigit &&
                         (id4.substring(2) == "db" || id4.substring(2) == "dc")) {
                frames += java.util.Arrays.copyOfRange(b, body, body + size.toInt)
              }
              off = body + size.toInt + (size.toInt & 1) // RIFF even padding
            }
          }
          walk(12, b.length, inMovi = false)
          if (defect != null) invalid(defect)
          else if (!hdrlSeen) invalid("no-hdrl")
          else if (!moviSeen) invalid("no-movi")
          else if (width <= 0 || height <= 0) invalid("bad-dimensions")
          else {
            val fs = frames.result()
            fs.zipWithIndex.map { case (f, i) =>
              AviFrame(id, valid = true, "", i, width, height, fourcc,
                fs.size, f)
            }
          }
        }
      }
  }

  /** Build an AVI container around prepared frame payloads (`"DIB "` →
    * `00db` chunks of raw bottom-up BGR rows; anything else → `00dc`,
    * e.g. `"MJPG"` with JPEG bytes). Minimal-but-conformant: avih +
    * one video strl (strh/strf) + movi; no idx1 (optional per spec,
    * and [[aviFrames]] reads stream order). */
  def aviWrite(width: Int, height: Int, fps: Int, fourcc: String,
               frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty)
    require(fourcc.length == 4, s"fourcc must be 4 chars: '$fourcc'")
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id4.getBytes(StandardCharsets.US_ASCII)).putInt(body.length)
        .put(body)
      out.array() // trailing pad byte (if any) stays zero
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.flatten.toArray
      val out = java.nio.ByteBuffer.allocate(12 + inner.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("LIST".getBytes(StandardCharsets.US_ASCII))
        .putInt(4 + inner.length)
        .put(listType.getBytes(StandardCharsets.US_ASCII)).put(inner)
      out.array()
    }
    val isDib = fourcc == "DIB "
    val avih = {
      val o = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      o.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.size).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      o.array()
    }
    val strh = {
      val o = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      o.put("vids".getBytes(StandardCharsets.US_ASCII))
        .put((if (isDib) "DIB " else fourcc)
          .getBytes(StandardCharsets.US_ASCII))
        .putInt(0).putShort(0.toShort).putShort(0.toShort).putInt(0)
        .putInt(1).putInt(fps).putInt(0).putInt(frames.size)
        .putInt(0).putInt(-1).putInt(0)
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(width.toShort).putShort(height.toShort)
      o.array()
    }
    val strf = {
      val o = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      o.putInt(40).putInt(width).putInt(height).putShort(1.toShort)
        .putShort(24.toShort)
      if (isDib) o.putInt(0) // biCompression = BI_RGB
      else o.put(fourcc.getBytes(StandardCharsets.US_ASCII))
      o.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      o.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi",
      frames.map(f => chunk(if (isDib) "00db" else "00dc", f)))
    val inner = hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(12 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      .putInt(4 + inner.length)
      .put("AVI ".getBytes(StandardCharsets.US_ASCII)).put(inner)
    out.array()
  }

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
  /** One image's EXIF/TIFF metadata census — or the defect row naming
    * why the container would not parse. `byte_order` is "II"/"MM";
    * `orientation` is -1 when the tag is absent, `datetime` "" likewise;
    * `has_gps`/`n_gps_entries` report the GPS IFD (the image lake's PII
    * class — see [[stripExifGps]]). */
  case class ExifMeta(id: Long, valid: Boolean, reason: String,
                      byte_order: String, orientation: Int,
                      datetime: String, has_gps: Boolean,
                      n_ifd0_entries: Int, n_gps_entries: Int)

  /** Walk the EXIF container row-locally — the [[parseMp4Meta]] pattern
    * for APP1/TIFF (public specs: TIFF 6.0, JEITA CP-3451): accepts a
    * bare TIFF stream (`II*\0` / `MM\0*`) or a JPEG whose APP1 segment
    * carries `Exif\0\0`, walks IFD0 for Orientation (0x0112), DateTime
    * (0x0132) and the GPS IFD pointer (0x8825), then counts the GPS
    * IFD's entries. Both endiannesses; every malformation (bad magic,
    * IFD overruns, unaligned counts, out-of-range value offsets) is a
    * defect ROW, never a task failure. Payloads never shuffle — the
    * census rides the scan. */
  def parseExif(df: DataFrame, idCol: String,
                payloadCol: String): Dataset[ExifMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val b = if (payload == null) Array.emptyByteArray else payload
        exifOne(id, b) match {
          case Left(reason) =>
            ExifMeta(id, valid = false, reason, "", -1, "", has_gps = false, 0, 0)
          case Right(m) => m
        }
      }
  }

  /** Locate the TIFF stream inside `b`: offset of the byte-order mark,
    * or the defect. Bare TIFF → 0; JPEG → inside the first APP1 segment
    * carrying the `Exif\0\0` identifier. */
  private def tiffStart(b: Array[Byte]): Either[String, Int] = {
    def u8(i: Int) = b(i) & 0xff
    if (b.length >= 4 &&
        ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M')))
      Right(0)
    else if (b.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) { // JPEG SOI
      var off = 2
      while (off + 4 <= b.length && u8(off) == 0xff) {
        val marker = u8(off + 1)
        if (marker == 0xd9 || marker == 0xda) return Left("no-exif-segment")
        val len = (u8(off + 2) << 8) | u8(off + 3) // includes the 2 len bytes
        if (len < 2 || off + 2 + len > b.length) return Left("truncated-segment")
        if (marker == 0xe1 && len >= 8 &&
            b(off + 4) == 'E' && b(off + 5) == 'x' && b(off + 6) == 'i' &&
            b(off + 7) == 'f' && b(off + 8) == 0 && b(off + 9) == 0)
          return Right(off + 10)
        off += 2 + len
      }
      Left("no-exif-segment")
    } else Left("not-tiff-or-jpeg")
  }

  /** Parse one payload's EXIF; shared by [[parseExif]] and
    * [[stripExifGps]] (the stripper re-walks to FIND the bytes it
    * zeroes). Returns the census or the defect reason. */
  private def exifOne(id: Long, b: Array[Byte]): Either[String, ExifMeta] =
    exifWalk(b).map { w =>
      ExifMeta(id, valid = true, "", w.order,
        w.orientation, w.datetime, w.gpsCount > 0, w.ifd0Count, w.gpsCount)
    }

  private final case class ExifWalk(order: String, tiff: Int,
                                    ifd0Count: Int, orientation: Int,
                                    datetime: String,
                                    gpsPtrEntryOff: Int, // abs offset of the 0x8825 IFD0 entry, -1 if none
                                    gpsIfdOff: Int,      // abs offset of the GPS IFD, -1
                                    gpsCount: Int,
                                    gpsSpans: Seq[(Int, Int)]) // abs (off, len) of GPS value bytes

  private def exifWalk(b: Array[Byte]): Either[String, ExifWalk] = {
    tiffStart(b).flatMap { t =>
      if (b.length - t < 8) return Left("truncated-tiff-header")
      val little = b(t) == 'I' && b(t + 1) == 'I'
      val big = b(t) == 'M' && b(t + 1) == 'M'
      if (!little && !big) return Left("bad-byte-order-mark")
      def u16(o: Int): Int =
        if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
          ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      if (u16(t + 2) != 42) return Left("bad-tiff-magic")
      val typeSize = Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)
      /** Walk one IFD at TIFF-relative `rel`; returns (count, entries as
        * (tag, absEntryOff, valueAbsOff, byteLen)) or a defect. */
      def ifd(rel: Long): Either[String, (Int, Seq[(Int, Int, Int, Int)])] = {
        val o = t + rel
        if (rel < 8 || o + 2 > b.length) return Left("ifd-out-of-range")
        val n = u16(o.toInt)
        if (o + 2 + n * 12 + 4 > b.length) return Left("ifd-overruns-file")
        val entries = (0 until n).map { i =>
          val e = (o + 2 + i * 12).toInt
          val tag = u16(e)
          val typ = u16(e + 2)
          val cnt = u32(e + 4)
          val sz = if (typ >= 1 && typ <= 12) typeSize(typ) else 0
          val byteLen = (sz * cnt).toInt
          val vOff =
            if (byteLen <= 4) e + 8
            else (t + u32(e + 8)).toInt
          (tag, e, vOff, byteLen)
        }
        // any out-of-line value overrunning the buffer is a defect
        entries.find { case (_, _, v, l) =>
          l > 4 && (v < t || v.toLong + l > b.length)
        } match {
          case Some(_) => Left("value-overruns-file")
          case None => Right((n, entries))
        }
      }
      val ifd0Rel = u32(t + 4)
      ifd(ifd0Rel).flatMap { case (n0, entries0) =>
        var orientation = -1
        var datetime = ""
        var gpsPtrEntry = -1
        var gpsIfdRel = -1L
        entries0.foreach { case (tag, e, v, l) =>
          tag match {
            case 0x0112 if l >= 2 => orientation = u16(v)
            case 0x0132 if l >= 1 =>
              val len = math.min(l, 64)
              datetime = new String(b, v, len, java.nio.charset.StandardCharsets.US_ASCII)
                .takeWhile(_ != 0).trim
            case 0x8825 if l >= 4 =>
              gpsPtrEntry = e
              gpsIfdRel = u32(v)
            case _ => ()
          }
        }
        val order = if (little) "II" else "MM"
        if (gpsPtrEntry < 0)
          Right(ExifWalk(order, t, n0, orientation, datetime, -1, -1, 0, Nil))
        else ifd(gpsIfdRel).map { case (ng, entriesG) =>
          val spans = entriesG.map { case (_, e, v, l) =>
            if (l > 4) (v, l) else (e + 8, 4) // inline values live in the entry
          }
          ExifWalk(order, t, n0, orientation, datetime, gpsPtrEntry,
            (t + gpsIfdRel).toInt, ng, spans)
        }
      }
    }
  }

  /** Orientation tag of a payload's EXIF, 1..8, or -1 when the tag (or
    * a parseable container) is absent — the row-local hook
    * [[ImageCodec.decodeImagesOriented]] composes with the pixel decode
    * so perceptual hashes are computed in DISPLAY orientation. */
  private[operators] def exifOrientation(payload: Array[Byte]): Int =
    exifWalk(if (payload == null) Array.emptyByteArray else payload)
      .map(_.orientation).getOrElse(-1)

  /** One image after GPS stripping: the (possibly rewritten) payload plus
    * the governance verdict. `gps_stripped` = a GPS IFD was found and
    * surgically zeroed; invalid containers pass through UNTOUCHED with
    * `valid = false` (quarantine-don't-guess: rewriting bytes we cannot
    * parse could corrupt them further). */
  case class GpsStripped(id: Long, valid: Boolean, reason: String,
                         gps_stripped: Boolean, payload: Array[Byte])

  /** Strip GPS EXIF in place — the image lake's PII scrub, beside
    * [[Curation]]'s text redaction: the IFD0 entry pointing at the GPS
    * IFD is retagged to 0xFFFE (readers skip unknown tags) with a zeroed
    * value, and every byte of the GPS IFD itself — entry table, next-IFD
    * link, and out-of-line coordinate rationals — is OVERWRITTEN with
    * zeros, not merely unreferenced. Offsets of all other data are
    * untouched, so the image decodes identically. Row-local typed pass;
    * payloads never shuffle. */
  def stripExifGps(df: DataFrame, idCol: String,
                   payloadCol: String): Dataset[GpsStripped] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val b = if (payload == null) Array.emptyByteArray else payload
        exifWalk(b) match {
          case Left(reason) =>
            GpsStripped(id, valid = false, reason, gps_stripped = false, b)
          case Right(w) if w.gpsPtrEntryOff < 0 =>
            GpsStripped(id, valid = true, "", gps_stripped = false, b)
          case Right(w) =>
            val out = b.clone()
            // retag the pointer entry (tag+type+count+value = 12 bytes)
            val e = w.gpsPtrEntryOff
            if (w.order == "II") { out(e) = 0xfe.toByte; out(e + 1) = 0xff.toByte }
            else { out(e) = 0xff.toByte; out(e + 1) = 0xfe.toByte }
            java.util.Arrays.fill(out, e + 2, e + 12, 0.toByte)
            // zero the GPS IFD block: count + entries + next-link
            val g = w.gpsIfdOff
            java.util.Arrays.fill(out, g, g + 2 + w.gpsCount * 12 + 4, 0.toByte)
            // and every out-of-line GPS value (coordinate rationals)
            w.gpsSpans.foreach { case (o, l) =>
              java.util.Arrays.fill(out, o, o + l, 0.toByte)
            }
            GpsStripped(id, valid = true, "", gps_stripped = true, out)
        }
      }
  }

  /** Build a minimal EXIF/TIFF payload for tests and planted oracles:
    * IFD0 with Orientation, DateTime, and (optionally) a GPS IFD with
    * latitude/longitude rationals — both endiannesses. Public TIFF 6.0
    * layout, values out-of-line where the spec puts them. */
  def tiffExif(little: Boolean, orientation: Int, datetime: String,
               gps: Option[(Double, Double)]): Array[Byte] = {
    require(datetime.length == 19, "EXIF DateTime is 'YYYY:MM:DD HH:MM:SS'")
    val buf = java.nio.ByteBuffer.allocate(512).order(
      if (little) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    buf.put((if (little) "II" else "MM").getBytes("US-ASCII"))
    buf.putShort(42.toShort)
    buf.putInt(8) // IFD0 right after the header
    val n0 = if (gps.isDefined) 3 else 2
    buf.putShort(n0.toShort)
    val dtOff = 8 + 2 + n0 * 12 + 4
    // Orientation: SHORT(3) x1, inline
    buf.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
      .putShort(orientation.toShort).putShort(0.toShort)
    // DateTime: ASCII(2) x20, out-of-line at dtOff
    buf.putShort(0x0132.toShort).putShort(2.toShort).putInt(20).putInt(dtOff)
    val gpsIfdOff = dtOff + 20
    if (gps.isDefined) // GPS IFD pointer: LONG(4) x1
      buf.putShort(0x8825.toShort).putShort(4.toShort).putInt(1).putInt(gpsIfdOff)
    buf.putInt(0) // next IFD
    buf.put(datetime.getBytes("US-ASCII")).put(0.toByte)
    gps.foreach { case (lat, lon) =>
      def rat(v: Double): (Int, Int) = (math.round(v * 1000000).toInt, 1000000)
      val latRatOff = gpsIfdOff + 2 + 4 * 12 + 4
      val lonRatOff = latRatOff + 8
      buf.putShort(4.toShort) // 4 GPS entries
      // GPSLatitudeRef: ASCII x2 inline
      buf.putShort(1.toShort).putShort(2.toShort).putInt(2)
        .put((if (lat >= 0) "N" else "S").getBytes("US-ASCII")).put(0.toByte)
        .putShort(0.toShort)
      // GPSLatitude: RATIONAL(5) x1 out-of-line
      buf.putShort(2.toShort).putShort(5.toShort).putInt(1).putInt(latRatOff)
      // GPSLongitudeRef
      buf.putShort(3.toShort).putShort(2.toShort).putInt(2)
        .put((if (lon >= 0) "E" else "W").getBytes("US-ASCII")).put(0.toByte)
        .putShort(0.toShort)
      // GPSLongitude
      buf.putShort(4.toShort).putShort(5.toShort).putInt(1).putInt(lonRatOff)
      buf.putInt(0) // next IFD
      val (ln, ld) = rat(math.abs(lat)); buf.putInt(ln).putInt(ld)
      val (on, od) = rat(math.abs(lon)); buf.putInt(on).putInt(od)
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }
  /** One FLAC stream's STREAMINFO census, or the defect row. The
    * [[parseMp4Meta]] honest-scope contract: container metadata only —
    * no codec decode ships offline, so frame audio stays out of reach,
    * but rate/channels/depth/length inventory over a mixed audio lake is
    * real and total. */
  case class FlacInfo(id: Long, valid: Boolean, reason: String,
                      sample_rate: Int, channels: Int, bits: Int,
                      total_samples: Long, n_meta_blocks: Int)

  /** Walk a FLAC container (public spec, RFC 9639 / xiph.org): `fLaC`
    * magic, then metadata blocks — 1-byte header (bit 7 = last, bits
    * 0-6 = type), 24-bit big-endian length — with STREAMINFO (type 0,
    * 34 bytes, REQUIRED FIRST by the spec) carrying the 20-bit sample
    * rate, 3-bit channels-1, 5-bit bits-1 and 36-bit total samples.
    * Row-local typed pass; every malformation is a defect row. */
  def parseFlac(df: DataFrame, idCol: String,
                payloadCol: String): Dataset[FlacInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val b = if (payload == null) Array.emptyByteArray else payload
        def invalid(reason: String) =
          FlacInfo(id, valid = false, reason, 0, 0, 0, 0L, 0)
        def u8(i: Int) = b(i) & 0xff
        if (b.length < 4 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
            b(3) != 'C') invalid("bad-magic")
        else {
          var off = 4
          var n = 0
          var last = false
          var info: FlacInfo = null
          var defect: String = null
          while (defect == null && !last) {
            if (b.length - off < 4) defect = "truncated-block-header"
            else {
              last = (u8(off) & 0x80) != 0
              val typ = u8(off) & 0x7f
              val len = (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
              if (b.length - off - 4 < len) defect = "truncated-block"
              else {
                if (n == 0) {
                  if (typ != 0) defect = "streaminfo-not-first"
                  else if (len != 34) defect = "bad-streaminfo-length"
                  else {
                    val o = off + 4
                    val rate = (u8(o + 10) << 12) | (u8(o + 11) << 4) |
                      (u8(o + 12) >> 4)
                    val channels = ((u8(o + 12) >> 1) & 0x7) + 1
                    val bits = (((u8(o + 12) & 1) << 4) | (u8(o + 13) >> 4)) + 1
                    val total = ((u8(o + 13) & 0xfL) << 32) |
                      ((u8(o + 14) & 0xffL) << 24) | ((u8(o + 15) & 0xffL) << 16) |
                      ((u8(o + 16) & 0xffL) << 8) | (u8(o + 17) & 0xffL)
                    if (rate == 0) defect = "zero-sample-rate"
                    else info = FlacInfo(id, valid = true, "", rate,
                      channels, bits, total, 0)
                  }
                }
                off += 4 + len
                n += 1
              }
            }
          }
          if (defect != null) invalid(defect)
          else info.copy(n_meta_blocks = n)
        }
      }
  }

  /** Build a FLAC metadata prefix for tests and planted oracles:
    * STREAMINFO (+ optional PADDING block). */
  def flacMeta(sampleRate: Int, channels: Int, bits: Int,
               totalSamples: Long, padding: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8 && bits >= 4 && bits <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + 34 + (if (padding) 4 + 6 else 0))
    buf.put("fLaC".getBytes("US-ASCII"))
    buf.put((if (padding) 0x00 else 0x80).toByte) // type 0, last unless padding follows
    buf.put(0.toByte).put(0.toByte).put(34.toByte)
    buf.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    buf.put(0.toByte).put(0.toByte).put(0.toByte)     // min framesize
    buf.put(0.toByte).put(0.toByte).put(0.toByte)     // max framesize
    buf.put((sampleRate >> 12).toByte)
    buf.put(((sampleRate >> 4) & 0xff).toByte)
    buf.put((((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bits - 1) >> 4)).toByte)
    buf.put(((((bits - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte)
    buf.putInt((totalSamples & 0xffffffffL).toInt)
    buf.put(new Array[Byte](16)) // MD5 of the (absent) audio data
    if (padding) {
      buf.put(0x81.toByte) // type 1, last
      buf.put(0.toByte).put(0.toByte).put(6.toByte)
      buf.put(new Array[Byte](6))
    }
    buf.array()
  }

  /** One MP3 stream's frame-header census, or the defect row.
    * `n_samples` = frames × 1152 (MPEG-1 Layer III); `cbr` = every
    * frame declares the first frame's bitrate. */
  case class Mp3Census(id: Long, valid: Boolean, reason: String,
                       sample_rate: Int, n_frames: Int, n_samples: Long,
                       cbr: Boolean)

  private val Mp3Bitrates = // MPEG-1 Layer III kbps by index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Walk MPEG-1 Layer III frame headers (public ISO/IEC 11172-3
    * layout): skip a leading ID3v2 tag (synchsafe size), then hop frame
    * to frame by the declared length `144·bitrate/sampleRate + padding`.
    * A wrong hop loses sync and surfaces as a defect — the length
    * arithmetic is therefore load-bearing, not decorative. Accepts a
    * trailing 128-byte ID3v1 `TAG`. Census only (no codec decode ships
    * offline): rate, frame/sample counts, CBR flag. */
  def parseMp3(df: DataFrame, idCol: String,
               payloadCol: String): Dataset[Mp3Census] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val b = if (payload == null) Array.emptyByteArray else payload
        def invalid(reason: String) =
          Mp3Census(id, valid = false, reason, 0, 0, 0L, cbr = false)
        def u8(i: Int) = b(i) & 0xff
        var off = 0
        // ID3v2: "ID3" + version(2) + flags(1) + synchsafe size(4); the
        // v2.4 footer flag (0x10) appends a 10-byte footer NOT counted
        // in size (r14 review: skipping only 10+size landed on the
        // footer's '3DI' bytes and quarantined every footered file)
        if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
          val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
          off = 10 + size + (if ((u8(5) & 0x10) != 0) 10 else 0)
        }
        if (off >= b.length || b.length - off < 4) invalid("no-frames")
        else {
          var nFrames = 0
          var rate = -1
          var firstBitrate = -1
          var cbr = true
          var defect: String = null
          var done = false
          while (defect == null && !done) {
            if (off == b.length) done = true
            else if (b.length - off == 128 && b(off) == 'T' &&
                b(off + 1) == 'A' && b(off + 2) == 'G') done = true
            else if (b.length - off < 4) defect = "truncated-frame-header"
            else if (!(u8(off) == 0xff && (u8(off + 1) & 0xe0) == 0xe0))
              defect = if (nFrames == 0) "no-sync" else "lost-sync"
            else if ((u8(off + 1) & 0x1e) != 0x1a) // MPEG-1 (11), Layer III (01)
              defect = "unsupported-version-or-layer"
            else {
              val brIdx = u8(off + 2) >> 4
              val srIdx = (u8(off + 2) >> 2) & 0x3
              val pad = (u8(off + 2) >> 1) & 0x1
              if (brIdx == 0 || brIdx == 15) defect = "bad-bitrate-index"
              else if (srIdx == 3) defect = "bad-samplerate-index"
              else {
                val sr = Mp3Rates(srIdx)
                if (rate < 0) rate = sr
                else if (rate != sr) defect = "samplerate-change"
                if (defect == null) {
                  val kbps = Mp3Bitrates(brIdx)
                  if (firstBitrate < 0) firstBitrate = kbps
                  else if (kbps != firstBitrate) cbr = false
                  val frameLen = 144 * kbps * 1000 / sr + pad
                  if (b.length - off < frameLen) defect = "truncated-frame"
                  else { off += frameLen; nFrames += 1 }
                }
              }
            }
          }
          if (defect != null) invalid(defect)
          else if (nFrames == 0) invalid("no-frames")
          else Mp3Census(id, valid = true, "", rate, nFrames,
            nFrames * 1152L, cbr)
        }
      }
  }

  /** Build an MPEG-1 Layer III frame sequence (headers + zero payload)
    * for tests and planted oracles: one frame per bitrate index, padding
    * bits as given. */
  def mp3Frames(srIdx: Int, bitrateIdxs: Seq[Int],
                paddings: Seq[Boolean]): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2 && bitrateIdxs.nonEmpty &&
      bitrateIdxs.length == paddings.length)
    require(bitrateIdxs.forall(i => i >= 1 && i <= 14))
    val sr = Mp3Rates(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    bitrateIdxs.zip(paddings).foreach { case (brIdx, pad) =>
      val frameLen = 144 * Mp3Bitrates(brIdx) * 1000 / sr + (if (pad) 1 else 0)
      val f = new Array[Byte](frameLen)
      f(0) = 0xff.toByte
      f(1) = 0xfa.toByte // MPEG-1, Layer III, no CRC
      f(2) = ((brIdx << 4) | (srIdx << 2) | (if (pad) 2 else 0)).toByte
      f(3) = 0.toByte
      out.write(f)
    }
    out.toByteArray
  }
}
