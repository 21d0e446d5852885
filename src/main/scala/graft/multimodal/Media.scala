package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time inside `mapPartitions`.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * feature output shape — is real and tested. The IMAGE codec is real:
  * `decodeRaster` decodes PNG/JPEG payloads via the JDK's javax.imageio
  * to a grayscale raster, and `resize`/`dHash` hash the decoded pixels
  * (PHashDedupSpec drives a real encoded PNG pair end to end). Payloads
  * that are not real images — the synthetic text fixtures, audio/video
  * blobs — fall back to the deterministic bytes-as-pixels model
  * (`decodeStub` for the feature histogram), which is what keeps the
  * DuckDB oracles replayable; an audio/video deployment swaps only that
  * fallback (e.g. ffmpeg via JNI), everything around it is unchanged.
  *
  * Scale notes: per-row transforms with no shuffle; binary payloads never
  * leave their partition; feature extraction emits small fixed-width rows
  * so downstream aggregation shuffles features, not media bytes.
  */
object Media {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      histogram: Array[Long], // 16-bin byte histogram
      frames_sampled: Int)

  /** Decoded 8-bit grayscale raster of a REAL image payload. */
  private[graft] final case class Raster(w: Int, h: Int, gray: Array[Byte])

  /** REAL image codec: decode a PNG or JPEG payload via `javax.imageio`
    * (JDK built-in — no external dependency) to an 8-bit grayscale
    * raster (integer ITU-R BT.601 luma). Gated on the container magic
    * bytes, NOT on ImageIO's own sniffing: a synthetic text payload is
    * valid UTF-8, where neither 0x89 (PNG signature byte 0) nor 0xFF
    * (JPEG SOI byte 0) can ever be the FIRST byte, so a text payload can
    * never be misread as an image and silently change its perceptual
    * hash — which is what keeps the text-fixture oracles hash-exact
    * while real encoded images take this path. Returns None for
    * anything that is not a decodable real image; callers fall back to
    * the bytes-as-pixels model. */
  private[graft] def decodeRaster(bytes: Array[Byte]): Option[Raster] = {
    val isPng = bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G' &&
      (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a
    val isJpeg = bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff
    if (!isPng && !isJpeg) None
    else
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gray = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val l = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              gray(y * w + x) = l.toByte
              x += 1
            }
            y += 1
          }
          Some(Raster(w, h, gray))
        }
      } catch {
        // a corrupt-but-signatured payload degrades to the fallback
        // model, never a task failure
        case _: Exception => None
      }
  }

  /** STUB — deterministic fake decode (feature histogram). Real image
    * payloads go through [[decodeRaster]]; this remains the no-dependency
    * fallback for the synthetic fixtures and non-image modalities;
    * signature (bytes → fixed-width features) is the contract the
    * pipeline depends on. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    hist
  }

  /** Byte offsets of n evenly-spaced 16-byte "frames" (ascending,
    * deduplicated — short payloads yield fewer than n). */
  private[graft] def frameOffsets(len: Int, n: Int): Seq[Int] =
    if (len < 16 || n <= 0) Seq.empty
    else {
      val step = math.max(1, (len - 16) / math.max(n - 1, 1))
      (0 until n).map(i => math.min(i * step, len - 16)).distinct
    }

  /** Deterministic frame sampling: n evenly-spaced 16-byte "frames". */
  private[graft] def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
    frameOffsets(bytes.length, n).map(off => bytes.slice(off, off + 16))

  final case class FrameRow(
      media_id: Long, frame_idx: Int, byte_offset: Long, frame: Array[Byte])

  /** Explode each media item into its sampled frames — the video/audio
    * frame-extraction plumbing (a real decoder replaces the byte-slice
    * "frame grab", nothing else changes). Partition-parallel flatMap, no
    * shuffle; output rows are fixed-width so downstream per-frame work
    * (embedding, dedup, quality) shuffles 16-byte frames, never payloads. */
  def frameRows(media: Dataset[MediaRow], framesPerItem: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        frameOffsets(r.bytes.length, framesPerItem).zipWithIndex.map {
          case (off, idx) =>
            FrameRow(r.media_id, idx, off.toLong, r.bytes.slice(off, off + 16))
        }
      }
    }
  }

  /** Batch feature extraction over the binary column — partition-parallel,
    * no shuffle, constant memory per row. */
  def extractFeatures(media: Dataset[MediaRow], framesPerItem: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = sampleFrames(r.bytes, framesPerItem)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.bytes.length.toLong,
          checksum = r.bytes.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff)),
          histogram = decodeStub(r.bytes),
          frames_sampled = frames.size)
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, kind: String, out_w: Int, out_h: Int,
      thumb: Array[Byte], px_sum: Long, px_checksum: Long)

  /** Nearest-neighbor resize to tw×th — the thumbnailing step of an image
    * pipeline. The index arithmetic IS the real nearest-neighbor kernel
    * (src_y = y·h÷th, src_x = x·w÷tw, row-major). The pixel source is
    * the REAL codec for real image payloads ([[decodeRaster]] — PNG/JPEG
    * via javax.imageio, grayscale luma raster with the image's own
    * dims) and the bytes-as-pixels model otherwise (payloads shorter
    * than width·height read 0 past the end — a truncated image); the
    * kernel, stats, and plan shape are identical either way. px_sum /
    * px_checksum (fold (a·31+px) mod 1e9+7) come out of the same pass —
    * the per-thumb stats a dedup or quality filter consumes downstream.
    * Partition-parallel map, no shuffle, constant memory per row. */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (src, srcW, srcH) = decodeRaster(r.bytes) match {
          case Some(raster) => (raster.gray, raster.w, raster.h)
          case None => (r.bytes, r.width, r.height)
        }
        val out = new Array[Byte](tw * th)
        var sum = 0L
        var ck = 0L
        var y = 0
        while (y < th) {
          // Long index arithmetic + both-bounds guard: corrupt metadata
          // (negative dims, width·height past Int.MaxValue) must degrade
          // to 0-pixels like any other out-of-range read, never throw
          val sy = y.toLong * srcH / th
          var x = 0
          while (x < tw) {
            val sx = x.toLong * srcW / tw
            val idx = sy * srcW + sx
            val px =
              if (idx >= 0 && idx < src.length) src(idx.toInt) & 0xff
              else 0
            out(y * tw + x) = px.toByte
            sum += px
            ck = (ck * 31 + px) % 1000000007L
            x += 1
          }
          y += 1
        }
        ResizedMedia(r.media_id, r.kind, tw, th, out, sum, ck)
      }
    }
  }

  final case class PHashRow(media_id: Long, ph_hi: Long, ph_lo: Long)

  /** 64-bit difference hash (dHash — the standard perceptual image hash):
    * resize to 9×8 with the SAME nearest-neighbor kernel as [[resize]],
    * then bit (y,x) = thumb(y,x) > thumb(y,x+1) — a horizontal-gradient
    * sign map, robust to uniform brightness/contrast shifts a mean-
    * threshold aHash is not. Packed as two 32-bit halves (`ph_hi` bits
    * 32–63, `ph_lo` bits 0–31, both non-negative) so the oracle mirror
    * never has to build a sign-bit literal (DuckDB raises on `1<<63`).
    *
    * Near-duplicate search over the hashes is a banded Hamming join
    * ([[graft.operators.MinHashLSH.hammingBandPairs]]) — pairs, never a
    * cross join. Scale: one narrow typed map after the resize pass;
    * payload bytes never shuffle, 2 longs per item cross the wire. */
  def dHash(media: Dataset[MediaRow]): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    resize(media, tw = 9, th = 8).map { r =>
      var lo = 0L; var hi = 0L
      var j = 0
      while (j < 64) {
        val y = j / 8; val x = j % 8
        if ((r.thumb(y * 9 + x) & 0xff) > (r.thumb(y * 9 + x + 1) & 0xff)) {
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
        j += 1
      }
      PHashRow(r.media_id, hi, lo)
    }
  }

  final case class AudioFpRow(media_id: Long, fp_hi: Long, fp_lo: Long)

  /** 64-bit audio fingerprint — the Haitsma–Kalker robust-hash scheme
    * (Philips, ISMIR 2002: overlapping windows → sub-band energies → sign
    * of the time- and band-difference of energies), the audio-modality
    * sibling of [[dHash]]. The payload's bytes stand in for PCM samples
    * (a real deployment decodes first; windowing, energies, and the
    * difference bits are the real algorithm): 17 evenly-spaced 32-byte
    * windows (hop = max(1, (n−32)/16), clamped like [[frameOffsets]]),
    * 5 six-byte sub-band energies per window, and
    *
    *   bit(t,f) = [ (E(t,f)−E(t,f+1)) − (E(t−1,f)−E(t−1,f+1)) > 0 ]
    *
    * for t ∈ 1..16, f ∈ 0..3 — 64 bits, packed as two non-negative
    * 32-bit halves like every hash the banded Hamming join consumes.
    * The double difference cancels any uniform gain/offset (E shifts by
    * a per-window constant per band), which the spec asserts directly.
    * Payloads under one window yield no row. Narrow typed flatMap, no
    * shuffle; 2 longs per item feed the dedup join. */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioFpRow] = {
    import media.sparkSession.implicits._
    val win = 32
    val windows = 17
    media.flatMap { r =>
      val n = r.bytes.length
      if (n < win) None
      else {
        val hop = math.max(1, (n - win) / (windows - 1))
        def energy(t: Int, f: Int): Long = {
          val off = math.min(t * hop, n - win)
          var s = 0L
          var k = f * 6
          while (k < f * 6 + 6) { s += r.bytes(off + k) & 0xff; k += 1 }
          s
        }
        var lo = 0L
        var hi = 0L
        var j = 0
        while (j < 64) {
          val t = j / 4 + 1
          val f = j % 4
          val d = (energy(t, f) - energy(t, f + 1)) -
            (energy(t - 1, f) - energy(t - 1, f + 1))
          if (d > 0) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
          j += 1
        }
        Some(AudioFpRow(r.media_id, hi, lo))
      }
    }
  }

  /** Like [[synthesize]] but with dimensions derived from the payload —
    * `w = max(8, ⌊√n⌋)`, `h = ⌈n/w⌉` — so the bytes-as-pixels raster
    * COVERS the payload instead of reading past it. [[synthesize]]'s
    * id-derived dims leave all but the first thumb row past the end of
    * typical payloads, which collapses every perceptual hash toward the
    * all-zero image; covering dims make hashes track content. */
  def synthesizeCovering(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val n = octet_length(col(payloadCol)).cast("long")
    val w = greatest(lit(8L), floor(sqrt(n.cast("double"))).cast("long"))
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      w.cast("int").as("width"),
      // floor of a correctly-rounded double division is exact here: the
      // true quotient is ≥ 1/w away from any integer it doesn't hit
      floor((n + w - lit(1L)) / w).cast("int").as("height"),
      lit(16000).as("sample_rate"))
  }

  /** Build a media frame from any table with an id + string payload —
    * test/bench helper producing deterministic binary content. */
  def synthesize(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      (pmod(col(idCol), lit(640)) + 16).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"))
}
