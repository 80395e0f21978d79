package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audio-corpus curation over the REAL WAV PCM decode
  * ([[Multimodal.decodeWavSamples]]): fixed-size analysis windows,
  * voice-activity segmentation, and loudness-fingerprint near-dup
  * detection — the screens a speech-training pipeline runs before
  * transcription (drop silence-only clips, measure voiced coverage,
  * collapse re-encoded copies).
  *
  * Scale shape: the per-payload work (decode + windowing) is a
  * partition-parallel `mapPartitions` with NO shuffle; everything
  * after operates on window rows (payload_seconds × rate / winSize
  * per payload — bounded, thousands per hour of audio at real window
  * sizes) and shuffles only on `media_id` or on the LSH band buckets.
  * Near-dup candidate generation reuses the engine's banded-LSH
  * primitives ([[graft.functions.CappedIds]] bounded collect +
  * [[graft.functions.SortedPairs]] in-row pair expansion) — never an
  * all-pairs join.
  *
  * Every packer here synthesizes payloads from id-driven integer
  * formulas, so the DuckDB oracle replays results as plain algebra
  * without decoding a byte: any defect in the RIFF walk, window
  * bucketing, or gating breaks the sums bit-for-bit (the x118
  * contract, extended to windowed analysis).
  */
object Audio {

  /** Samples per analysis window used by the catalog queries (at a
    * real 16 kHz rate a production window is ~400 samples / 25 ms;
    * the algebra is identical). */
  val WinSize = 16

  /** Mean-|sample| gate separating voiced from silent windows. The
    * synthetic payloads keep a ≥2× guard band on BOTH sides (voiced
    * samples are ≥ 8192 in magnitude, silent ones ≤ 512), so the
    * gate is never decided by a rounding edge. */
  val MeanAbsGate = 4096L

  /** VAD-patterned WAVs: window `w` of id is VOICED iff
    * `(id·31 + w²·13) mod 7 < 4` (≈57% voiced, and the quadratic
    * term gives irregular run lengths — longest runs 1..6 across
    * ids); voiced sample i is `±(8192 + (id·37 + i·101) mod
    * 20000)` (sign from `(id + i) mod 2`), silent sample i is
    * `(id·13 + i·7) mod 1024 − 512`. `id mod 24 + 8` windows of
    * [[WinSize]] samples, 16 kHz mono PCM16. */
  def packVadWavs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val nWin = (id % 24 + 8).toInt
      val samples = Array.tabulate(nWin * WinSize) { i =>
        val w = i / WinSize
        if ((id * 31 + w.toLong * w * 13) % 7 < 4) voicedSample(id, i)
        else silentSample(id, i)
      }
      (id, Multimodal.buildWav(16000, samples))
    }.toDF("media_id", "media")
  }

  /** Copy-corpus WAVs for near-dup detection: content key
    * `k = id mod half`, so ids `k` and `k + half` are COPIES of the
    * same recording — except the copy flips the loudness of exactly
    * window `k mod 32` (one corrupted frame → Hamming distance 1
    * between their fingerprints). Window `w` of key k is voiced iff
    * `((k·2654435761) xor (w·40503)) mod 97 < 58` — the XOR mix is
    * deliberate: a LINEAR congruential rule collapses to k mod 97
    * and hands every residue class an identical signature, where the
    * xor keeps all 250 signatures distinct with zero incidental
    * Hamming-≤2 pairs (measured), so the planted copies are exactly
    * the near-dup set. 32 windows; sample formulas as
    * [[packVadWavs]] driven by k (copies are byte-identical outside
    * the flipped window). */
  def packAudioCopies(spark: SparkSession, df: DataFrame, idCol: String,
      half: Long): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val k = id % half
      val flip = id >= half
      val samples = Array.tabulate(32 * WinSize) { i =>
        val w = i / WinSize
        val baseVoiced = ((k * 2654435761L) ^ (w * 40503L)) % 97 < 58
        val voiced = baseVoiced ^ (flip && w == (k % 32))
        if (voiced) voicedSample(k, i) else silentSample(k, i)
      }
      (id, Multimodal.buildWav(16000, samples))
    }.toDF("media_id", "media")
  }

  private def voicedSample(key: Long, i: Int): Short = {
    val sign = if ((key + i) % 2 == 0) 1 else -1
    (sign * (8192 + (key * 37 + i.toLong * 101) % 20000)).toShort
  }

  private def silentSample(key: Long, i: Int): Short =
    ((key * 13 + i.toLong * 7) % 1024 - 512).toShort

  /** Fixed-size analysis windows through the real PCM decode: one row
    * per (payload, window) with exact integer stats — sample count,
    * Σ|s|, Σs² (energy), peak |s|, clipped-sample count (|s| ≥
    * 32000, the x118 threshold). Partition-parallel, no shuffle;
    * undecodable payloads are screened out, not thrown. */
  def audioWindows(spark: SparkSession, packed: DataFrame,
      winSize: Int = WinSize): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Multimodal.decodeWavSamples(bytes).iterator.flatMap {
            case (_, _, samples) =>
              samples.grouped(winSize).zipWithIndex.map { case (ws, w) =>
                var sumAbs = 0L; var sumSq = 0L; var peak = 0L
                var clip = 0L
                var i = 0
                while (i < ws.length) {
                  val s = ws(i).toLong
                  val a = math.abs(s)
                  sumAbs += a; sumSq += s * s
                  if (a > peak) peak = a
                  if (a >= 32000) clip += 1
                  i += 1
                }
                (id, w.toLong, ws.length.toLong, sumAbs, sumSq, peak,
                  clip)
              }
          }
        }
      }
      .toDF("media_id", "win", "n", "sum_abs", "sum_sq", "peak",
        "n_clip")
  }

  /** Voice-activity segmentation over window rows: a window is voiced
    * iff `sum_abs ≥ n · meanAbsGate`; consecutive voiced windows form
    * a segment (gaps-and-islands: island key = win − row_number over
    * voiced windows). Per payload: window/voiced counts, segment
    * count, longest segment, voiced share in floored ppm. The window
    * function partitions by `media_id` — per-payload window counts
    * are bounded, so no partition outgrows an executor. */
  def vadSegments(windows: DataFrame,
      meanAbsGate: Long = MeanAbsGate): DataFrame = {
    val islands = windows
      .where(col("sum_abs") >= col("n") * meanAbsGate)
      .withColumn("__isl", col("win") - row_number().over(
        Window.partitionBy("media_id").orderBy("win")))
    val segs = islands.groupBy("media_id", "__isl")
      .agg(count(lit(1)).as("__len"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_segments"), max("__len").as("longest_run"),
        sum("__len").as("n_voiced"))
    windows.groupBy("media_id").agg(count(lit(1)).as("n_windows"))
      .join(segs, Seq("media_id"), "left_outer")
      .select(col("media_id"), col("n_windows"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        expr("(coalesce(n_voiced, CAST(0 AS BIGINT)) * CAST(1000000 AS BIGINT)) DIV n_windows")
          .as("voiced_ppm"))
  }

  /** Loudness fingerprint: bit `w` of the signature is window w's
    * voiced gate — a compact content hash that survives re-encoding
    * (it depends on energy envelope, not bytes). One hash aggregate
    * per payload. */
  def fingerprints(windows: DataFrame,
      meanAbsGate: Long = MeanAbsGate): DataFrame =
    windows.groupBy("media_id")
      .agg(sum(when(col("sum_abs") >= col("n") * meanAbsGate,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(win AS INT))"))
        .otherwise(lit(0L))).as("sig"))

  /** Mixed-defect corpus for the curation funnel, one deterministic
    * class per `id mod 6`:
    *  - 0: NOT a WAV (junk bytes) — decode screen;
    *  - 1: silence-heavy (one voiced window of 32) — VAD gate;
    *  - 2: fully clipped (every sample ≥ 32000 in magnitude, loud
    *       enough to pass VAD) — clipping gate;
    *  - 3: good original, voiced rule as [[packAudioCopies]] keyed
    *       by the id itself;
    *  - 4: near-dup COPY of id−1 (class 3) with window (id−1) mod 32
    *       loudness-flipped — the dedup stage's prey;
    *  - 5: good unique.
    * 32 windows throughout. Verified at design time: the planted
    * (id, id+1) pairs are EXACTLY the Hamming-≤2 set over classes
    * 3/4/5, and the minimum voiced share among eligible payloads is
    * 281,250 ppm — the 250,000 default gate clears every good
    * payload deterministically. */
  def packCurateWavs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val cls = id % 6
      if (cls == 0L) {
        (id, s"JUNK-payload-$id".getBytes("US-ASCII"))
      } else {
        val key = if (cls == 4L) id - 1 else id
        val samples = Array.tabulate(32 * WinSize) { i =>
          val w = i / WinSize
          if (cls == 1L) {
            if (w == 0) voicedSample(key, i) else silentSample(key, i)
          } else if (cls == 2L) {
            val sign = if ((key + i) % 2 == 0) 1 else -1
            (sign * (32100 + (key * 37 + i.toLong * 101) % 600)).toShort
          } else {
            val baseVoiced =
              ((key * 2654435761L) ^ (w * 40503L)) % 97 < 58
            val voiced = baseVoiced ^ (cls == 4L && w == (key % 32))
            if (voiced) voicedSample(key, i) else silentSample(key, i)
          }
        }
        (id, Multimodal.buildWav(16000, samples))
      }
    }.toDF("media_id", "media")
  }

  /** The audio curation funnel in one pass over the window relation:
    * decode screen (undecodable payloads emit no windows) → VAD gate
    * (voiced share ≥ `minVoicedPpm`) → clipping gate (clipped-sample
    * share ≤ `maxClippedPpm`) → near-dup collapse (fingerprint LSH
    * pairs → connected components → min-id survivor per cluster, the
    * [[Dedup.clusterSurvivors]] rule). Returns the survivor ids and
    * a ONE-ROW funnel audit (input / decoded / vad_pass / clip_pass /
    * unique counts).
    *
    * Scale shape: ONE decode pass feeds every stage (the window
    * relation is reused for gates and fingerprints); gates are a
    * single per-media hash agg; the dedup stage sees only gate
    * survivors; the funnel counters ride the same frames — no
    * per-counter recomputation of the expensive stages (the
    * Curate.report lesson). */
  def curate(spark: SparkSession, packed: DataFrame,
      minVoicedPpm: Long = 250000L, maxClippedPpm: Long = 100000L)
      : (DataFrame, DataFrame) = {
    val win = audioWindows(spark, packed)
    val perMedia = win.groupBy("media_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("sum_abs") >= col("n") * MeanAbsGate, 1L)
          .otherwise(0L)).as("n_voiced"),
        sum("n_clip").as("n_clipped"), sum("n").as("n_samples"))
      .withColumn("voiced_ppm",
        expr("n_voiced * CAST(1000000 AS BIGINT) DIV n_windows"))
      .withColumn("clipped_ppm",
        expr("n_clipped * CAST(1000000 AS BIGINT) DIV n_samples"))
      .withColumn("vad_ok", col("voiced_ppm") >= minVoicedPpm)
      .withColumn("clip_ok",
        col("vad_ok") && col("clipped_ppm") <= maxClippedPpm)
    val gatePass = perMedia.where(col("clip_ok"))
      .select(col("media_id"))
    val sigs = fingerprints(
      win.join(gatePass, Seq("media_id"), "left_semi"))
    val survivors = Dedup.clusterSurvivors(gatePass, "media_id",
      nearDupPairs(sigs))
    val funnel = packed.agg(count(lit(1)).as("n_input"))
      .crossJoin(perMedia.agg(count(lit(1)).as("n_decoded"),
        count(when(col("vad_ok"), 1)).as("n_vad_pass"),
        count(when(col("clip_ok"), 1)).as("n_clip_pass")))
      .crossJoin(survivors.agg(count(lit(1)).as("n_unique")))
    (survivors, funnel)
  }

  /** Sample-rate normalization — the "every clip at 16 kHz before
    * feature extraction" step: linear-interpolation resample of each
    * mono payload to `targetRate`, re-encoded as a real WAV.
    * Fixed-point INTEGER interpolation in an unsigned domain: output
    * sample j sits at input position j·r/t, so with i0 = ⌊j·r/t⌋ and
    * frac = (j·r) mod t, v = (u(i0)·(t−frac) + u(i0+1)·frac) div t
    * where u = s + 32768 keeps every numerator non-negative —
    * truncating and flooring division agree, so the arithmetic is
    * bit-reproducible on any engine (the DuckDB oracle replays it
    * exactly). Partition-parallel, no shuffle; non-mono or
    * undecodable payloads are screened out. */
  def resamplePcm(spark: SparkSession, packed: DataFrame,
      targetRate: Int): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Multimodal.decodeWavSamples(bytes).collect {
            case (rate, 1, s) if s.nonEmpty =>
              val t = targetRate.toLong; val r = rate.toLong
              val nOut = ((s.length - 1) * t / r + 1).toInt
              val out = Array.tabulate(nOut) { j =>
                val pos = j * r
                val i0 = (pos / t).toInt
                val frac = pos % t
                val u0 = s(i0) + 32768L
                val u1 = s(math.min(i0 + 1, s.length - 1)) + 32768L
                ((u0 * (t - frac) + u1 * frac) / t - 32768L).toShort
              }
              (id, Multimodal.buildWav(targetRate, out))
          }
        }
      }
      .toDF("media_id", "media")
  }

  /** Peak (gain) normalization — the "every clip at the same
    * loudness ceiling" step: scale each mono payload so its peak
    * |sample| becomes `targetPeak`, re-encoded as a real WAV. The
    * scale is exact integer algebra with sign split out —
    * v' = sign(v) · (|v| · targetPeak div peak) — so every division
    * runs on non-negative operands and truncating == flooring ==
    * replayable anywhere. Quiet clips amplify, loud clips attenuate;
    * all-zero payloads pass through unscaled (peak 0 has no gain).
    * Partition-parallel, one decode+encode per payload, no
    * shuffle. */
  def normalizePeak(spark: SparkSession, packed: DataFrame,
      targetPeak: Int = 30000): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Multimodal.decodeWavSamples(bytes).collect {
            case (rate, 1, s) if s.nonEmpty =>
              var peak = 0L
              var i = 0
              while (i < s.length) {
                val a = math.abs(s(i).toLong)
                if (a > peak) peak = a
                i += 1
              }
              val out =
                if (peak == 0L) s
                else Array.tabulate(s.length) { j =>
                  val v = s(j).toLong
                  val scaled = math.abs(v) * targetPeak / peak
                  (if (v < 0) -scaled else scaled).toShort
                }
              (id, Multimodal.buildWav(rate, out))
          }
        }
      }
      .toDF("media_id", "media")
  }

  /** Near-dup pairs over loudness fingerprints — the 32-bit audio
    * instantiation of [[Dedup.hammingNearDupPairs]] (4 bands × 8
    * bits; Hamming-h pairs agree on ≥ 4−h bands). */
  def nearDupPairs(sigs: DataFrame, bands: Int = 4, bandBits: Int = 8,
      maxBucketSize: Int = 64, maxHamming: Int = 2): DataFrame =
    Dedup.hammingNearDupPairs(sigs, bands, bandBits, maxBucketSize,
      maxHamming)

  // ------------------------------------------------------------------
  // REAL MP3 frame-header walk (r17 — the audio twin of the JPEG SOF
  // walk): MPEG audio frames carry their whole geometry in a 32-bit
  // fixed-layout header (sync, version, layer, bitrate index, sample
  // rate, padding — ISO/IEC 11172-3), so frame count, total duration
  // and mean bitrate are REAL metadata with zero entropy decoding —
  // the screen/curation fields an audio-corpus pipeline gates on
  // (duration caps, bitrate floors, truncation detection). Only the
  // SAMPLE decode (the entropy-coded payload) remains the contract
  // stub.
  // ------------------------------------------------------------------

  /** MPEG-1 Layer III bitrates (kbps) by index 1..14. */
  private val mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val mp3SampleRates = Array(44100, 48000, 32000)

  /** Walk an MP3 stream's frames: skip an ID3v2 tag (synchsafe
    * length), then hop frame to frame by each header's own computed
    * size (`144·bitrate/sampleRate + padding` for MPEG-1 Layer III).
    * Returns (sampleRate, frames, durationMs floored, meanBitrateKbps
    * floored) or None for anything that is not a clean CBR/VBR
    * MPEG-1 Layer III stream (free-format, reserved indices, layer
    * I/II, MPEG-2, torn tails all screen — a crawl decode must
    * screen, not throw). Trailing ID3v1 tags (128-byte 'TAG') are
    * tolerated. */
  private[graft] def mp3Info(bytes: Array[Byte])
      : Option[(Int, Long, Long, Long)] =
    try {
      var pos = 0
      // ID3v2: "ID3" + ver(2) + flags + 4 synchsafe size bytes
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
          bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        pos = 10 + sz
      }
      var frames = 0L
      var kbpsSum = 0L
      var sr = -1
      while (pos + 4 <= bytes.length) {
        val b0 = bytes(pos) & 0xff; val b1 = bytes(pos + 1) & 0xff
        if (b0 == 'T' && b1 == 'A' && (bytes(pos + 2) & 0xff) == 'G' &&
            bytes.length - pos == 128) {
          pos = bytes.length // trailing ID3v1 tag
        } else {
          if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // lost sync
          if ((b1 & 0x18) != 0x18) return None // not MPEG-1
          if ((b1 & 0x06) != 0x02) return None // not Layer III
          val b2 = bytes(pos + 2) & 0xff
          val br = (b2 >> 4) & 0x0f
          val sri = (b2 >> 2) & 0x03
          if (br == 0 || br == 15 || sri == 3) return None
          val rate = mp3SampleRates(sri)
          if (sr < 0) sr = rate
          else if (sr != rate) return None // mixed sample rates
          val pad = (b2 >> 1) & 1
          val size = 144 * mp3Bitrates(br) * 1000 / rate + pad
          if (pos + size > bytes.length) return None // torn tail
          frames += 1
          kbpsSum += mp3Bitrates(br)
          pos += size
        }
      }
      if (frames == 0 || pos != bytes.length) None
      else Some((sr, frames, frames * 1152L * 1000L / sr,
        kbpsSum / frames))
    } catch { case _: Exception => None }

  /** Per-payload MP3 stream stats through the real frame walk —
    * partition-parallel mapPartitions, undecodable payloads screened
    * out like every decode stage. */
  def mp3Stats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        mp3Info(bytes).map { case (sr, fr, ms, kbps) =>
          (id, sr.toLong, fr, ms, kbps)
        }
      })
      .toDF("media_id", "sample_rate", "n_frames", "duration_ms",
        "mean_kbps")
  }

  /** Deterministic REAL MP3 framings from an id column (the
    * [[Multimodal.packRealPngs]] pattern): genuine MPEG-1 Layer III
    * headers — frame count, per-frame bitrate index and sample rate
    * derived from the id, payloads zero-filled (the entropy-coded
    * samples are the contract stub; the STRUCTURE is real and
    * self-describing). Every third id carries an ID3v2 tag, every
    * fifth a trailing ID3v1 'TAG' block, so the walk's skip paths are
    * exercised; the oracle replays frames/duration/bitrate as id
    * algebra. */
  def packRealMp3s(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val frames = (id % 9 + 2).toInt
      val sri = (id % 3).toInt
      val out = new java.io.ByteArrayOutputStream()
      if (id % 3 == 0) {
        // ID3v2 tag: 17-byte body, synchsafe-coded
        out.write("ID3".getBytes("US-ASCII")); out.write(3); out.write(0)
        out.write(0); out.write(0); out.write(0); out.write(0)
        out.write(17)
        (0 until 17).foreach(_ => out.write(0))
      }
      for (f <- 0 until frames) {
        val br = ((id * 7 + f) % 14 + 1).toInt
        val rate = mp3SampleRates(sri)
        val pad = ((id + f) % 2).toInt
        val size = 144 * mp3Bitrates(br) * 1000 / rate + pad
        out.write(0xff); out.write(0xfb) // MPEG-1 Layer III, no CRC
        out.write((br << 4) | (sri << 2) | (pad << 1))
        out.write(0x40) // joint stereo
        (4 until size).foreach(_ => out.write(0))
      }
      if (id % 5 == 0) {
        out.write("TAG".getBytes("US-ASCII"))
        (3 until 128).foreach(_ => out.write(0))
      }
      (id, out.toByteArray)
    }.toDF("media_id", "media")
  }
}
