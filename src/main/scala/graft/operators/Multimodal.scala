package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature-extract
  * / frame-sample stages.
  *
  * The decode surface is real, not stubbed, for every image
  * container: PNG (r10 — zlib `Inflater` + the five filter
  * predictors, byte-exact), GIF (LZW), BMP, and (r17) baseline
  * sequential JPEG ([[decodeJpeg]] — marker walk, DQT/DHT/SOF0/SOS,
  * Huffman DC/AC entropy decode with restart markers, dequant,
  * separable IDCT, YCbCr→RGB), plus WAV PCM samples and the MP4 box
  * walk. Only compressed AUDIO codecs (MP3/AAC frames) keep a
  * clearly-marked deterministic STUB (`decodeFeaturesStub`,
  * `resizeStub` — no ffmpeg in this container); the batching and
  * schema shape around those stubs is real, so swapping in a codec
  * is a one-function change.
  */
object Multimodal {

  /** media payload + typed metadata, the lake schema for multimodal
    * columns: `id, media binary, meta struct<format,width,height,n_frames>`. */
  def packFake(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    // deterministic pseudo-hash from (id, payload size) in plain modular
    // arithmetic: overflow-free under ANSI and reproducible by any
    // SQL engine (unlike xxhash64) — this is what makes the fake meta
    // oracle-checkable
    val h = pmod(
      pmod(col(idCol).cast("long"), lit(100000L)) * lit(2654435761L) +
        length(payload).cast("long") * lit(1000003L),
      lit(2147483647L))
    df.select(
      col(idCol).as("media_id"),
      payload.as("media"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
          (h % 4 + 1).cast("int")).as("format"),
        (h % 1024 + 64).cast("int").as("width"),
        (h % 768 + 64).cast("int").as("height"),
        (h % 240 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** Container magic-byte prefixes (hex) per declared format. WAV is
    * the full RIFF header shape (`RIFF` + 4 size bytes + `WAVE`), MP4
    * the `ftyp` box (4 size bytes + `ftyp`). */
  val magicPrefixHex: Map[String, String] = Map(
    "png" -> "89504E470D0A1A0A",
    "jpeg" -> "FFD8FFE0",
    "wav" -> "524946460000000057415645",
    "mp4" -> "0000001866747970")

  /** [[packFake]] with each payload carrying its declared format's
    * REAL magic bytes — the fixture for format-validation tests and
    * the x31 oracle. */
  def packFakeWithMagic(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val packed = packFake(df, idCol, textCol)
    val magic = element_at(typedlit(magicPrefixHex), col("meta.format"))
    packed.withColumn("media", concat(unhex(magic), col("media")))
  }

  /** Format SNIFFING from magic bytes — a REAL multimodal operator (no
    * codec needed): map-only column algebra over the first 12 payload
    * bytes, the standard lake-ingest validation that a blob claiming
    * to be X actually starts like X. PNG/JPEG by prefix, WAV by
    * RIFF....WAVE, MP4 by the ftyp box at offset 4; anything else is
    * "unknown". */
  def sniffFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(media, 1, 12))
    when(h.startsWith("89504E470D0A1A0A"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("474946383961") || h.startsWith("474946383761"), "gif")
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", "wav")
      .when(substring(h, 9, 8) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** REAL image dimensions with NO codec: the width/height of PNG and
    * GIF payloads live at fixed header offsets (PNG IHDR: two
    * big-endian u32 at bytes 17/21; GIF logical screen descriptor:
    * two little-endian u16 at bytes 7/9), so extraction is pure byte
    * arithmetic — `substring` + `hex` + `conv`, all codegen'd column
    * algebra, the same class as [[sniffFormat]]. This retires the
    * codec stub for the metadata a layout/filter decision actually
    * needs (aspect ratio, min-resolution gates, storage estimates);
    * pixel DECODE remains the contract-accepted stub. JPEG (r13, the
    * majority format in any real crawl) goes through the codegen'd
    * [[graft.functions.JpegSofDims]] SOF marker walk — data-dependent
    * segment hops, no entropy decoding; truncated/corrupt streams and
    * short payloads read null. Output: struct(width, height) or
    * null. */
  def imageDims(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be(off: Int, len: Int) =
      conv(hex(substring(media, off, len)), 16, 10).cast("long")
    def le16(off: Int) =
      conv(concat(hex(substring(media, off + 1, 1)),
        hex(substring(media, off, 1))), 16, 10).cast("long")
    val fmt = sniffFormat(media)
    val jd = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.JpegSofDims(
        org.apache.spark.sql.graft.ColumnBridge.expression(media)))
    when(fmt === "png" && length(media) >= 24,
        struct(be(17, 4).as("width"), be(21, 4).as("height")))
      .when(fmt === "gif" && length(media) >= 10,
        struct(le16(7).as("width"), le16(9).as("height")))
      .when(fmt === "jpeg" && jd.isNotNull,
        struct(jd.bitwiseAND(lit(65535L)).as("width"),
          shiftright(jd, 16).as("height")))
      .otherwise(lit(null).cast("struct<width:bigint,height:bigint>"))
  }

  /** Deterministic PNG/GIF payloads with REAL headers — width/height
    * derived from the id and written into genuine IHDR / logical-
    * screen-descriptor bytes, so [[imageDims]] exercises actual
    * header parsing and an external oracle replays the dims from the
    * same id algebra. Even ids pack PNG (big-endian), odd ids GIF
    * (little-endian). */
  def packFakeImages(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val w = (pmod(id, lit(1920L)) + 16L).cast("long")
    val h = (pmod(id * 7L, lit(1080L)) + 16L).cast("long")
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
    val gifHex = concat(lit("474946383961"),
      lpad(hex(w.bitwiseAND(255L)), 2, "0"), lpad(hex(shiftright(w, 8)), 2, "0"),
      lpad(hex(h.bitwiseAND(255L)), 2, "0"), lpad(hex(shiftright(h, 8)), 2, "0"),
      lit("F70000"))
    df.select(id.as("media_id"),
      unhex(when(pmod(id, lit(2L)) === 0L, pngHex).otherwise(gifHex))
        .as("media"))
  }

  /** Deterministic JPEG payloads with REAL marker-segment structure —
    * the [[packFakeImages]] companion for the SOF walk: SOI, a
    * canonical 18-byte JFIF APP0, an id-LENGTH-VARYING COM segment
    * (every id exercises a different hop distance, so the walk is
    * tested at every alignment, not one lucky offset), then SOF0 with
    * id-derived big-endian height/width. The oracle replays dims and
    * total length from the id algebra alone —
    * parse(synthesize(dims)) == dims, the x100 pattern. */
  def packFakeJpegs(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val w = pmod(id, lit(3000L)) + 16L
    val h = pmod(id * 7L, lit(2000L)) + 16L
    val comPayload = pmod(id, lit(29L)) + 2L // bytes after the COM length
    val app0 = lit("FFE000104A46494600010100000100010000")
    val com = concat(lit("FFFE"), lpad(hex(comPayload + 2L), 4, "0"),
      repeat(lit("41"), comPayload.cast("int")))
    val sof = concat(lit("FFC0001108"), lpad(hex(h), 4, "0"),
      lpad(hex(w), 4, "0"), lit("03012200021101031101"))
    df.select(id.as("media_id"),
      unhex(concat(lit("FFD8"), app0, com, sof)).as("media"))
  }

  /** EXIF ORIENTATION (1–8) via the codegen'd APP1 → TIFF IFD walk
    * ([[graft.functions.ExifOrientation]]) — the rotate/flip flag a
    * crawl pipeline must normalize BEFORE resize/fingerprint, or
    * portrait images train sideways; both TIFF byte orders parse,
    * non-Exif APP1s (XMP) are hopped, truncated/hostile bytes read
    * null. */
  def exifOrientation(media: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ExifOrientation(
        org.apache.spark.sql.graft.ColumnBridge.expression(media)))

  /** Deterministic JPEGs with a REAL Exif APP1 — the
    * [[packFakeJpegs]] companion for the TIFF IFD walk: SOI, an
    * id-LENGTH-VARYING COM (every id hops the walk at a different
    * alignment), then APP1 `Exif\0\0` + a genuine 64-byte TIFF block
    * — byte order ALTERNATING by id (`II` even / `MM` odd), magic
    * 42, a 3-entry IFD0 where orientation (id%8+1) sits BETWEEN a
    * Make ASCII entry and an XResolution RATIONAL (the walk must
    * match the tag, not read a lucky offset; both pointed data areas
    * are real) — then SOF0 with the x164 dims. The oracle replays
    * orientation, dims and total length from the id algebra alone. */
  def packFakeExifJpegs(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val w = pmod(id, lit(3000L)) + 16L
    val h = pmod(id * 7L, lit(2000L)) + 16L
    val ori = pmod(id, lit(8L)) + 1L
    val comPayload = pmod(id, lit(29L)) + 2L
    val com = concat(lit("FFFE"), lpad(hex(comPayload + 2L), 4, "0"),
      repeat(lit("41"), comPayload.cast("int")))
    // 64-byte TIFF blocks; offsets 0x32/0x38 point at the Make and
    // XResolution data that follow the IFD — relative to TIFF start
    val tiffII = concat(
      lit("49492A0008000000" + "0300" +
        "0F01" + "0200" + "06000000" + "32000000" +
        "1201" + "0300" + "01000000"),
      lpad(hex(ori), 2, "0"), lit("000000"),
      lit("1A01" + "0500" + "01000000" + "38000000" +
        "00000000" + "41434D450000" + "4800000001000000"))
    val tiffMM = concat(
      lit("4D4D002A00000008" + "0003" +
        "010F" + "0002" + "00000006" + "00000032" +
        "0112" + "0003" + "00000001" + "00"),
      lpad(hex(ori), 2, "0"), lit("0000"),
      lit("011A" + "0005" + "00000001" + "00000038" +
        "00000000" + "41434D450000" + "0000004800000001"))
    val app1 = concat(lit("FFE10048457869660000"),
      when(pmod(id, lit(2L)) === 0L, tiffII).otherwise(tiffMM))
    val sof = concat(lit("FFC0001108"), lpad(hex(h), 4, "0"),
      lpad(hex(w), 4, "0"), lit("03012200021101031101"))
    df.select(id.as("media_id"),
      unhex(concat(lit("FFD8"), com, app1, sof)).as("media"))
  }

  /** REAL audio metadata with NO codec — the WAV companion to
    * [[imageDims]]: a canonical RIFF/WAVE header carries channels
    * (u16 LE @ 23), sample rate (u32 LE @ 25), byte rate (u32 LE @
    * 29) and the data-chunk size (u32 LE @ 41), so channels/rate/
    * duration are fixed-offset byte arithmetic. `duration_ms` is the
    * exact integer `data_bytes · 1000 DIV byte_rate`. Non-WAV or
    * truncated payloads read null; a sniffed-WAV header declaring
    * byte_rate = 0 reads a null duration_ms (not the
    * floor(Infinity) → Long.MaxValue a non-ANSI double divide would
    * emit) while channels/sample_rate still parse. Output:
    * struct(channels, sample_rate, duration_ms). */
  def wavInfo(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def le(off: Int, len: Int) = {
      val bytes = (0 until len).map(i => hex(substring(media, off + i, 1)))
      conv(concat(bytes.reverse: _*), 16, 10).cast("long")
    }
    when(sniffFormat(media) === "wav" && length(media) >= 44,
        struct(le(23, 2).as("channels"), le(25, 4).as("sample_rate"),
          when(le(29, 4) > 0,
            floor((le(41, 4) * 1000L).divide(le(29, 4))).cast("long"))
            .as("duration_ms")))
      .otherwise(lit(null)
        .cast("struct<channels:bigint,sample_rate:bigint,duration_ms:bigint>"))
  }

  /** MP4 MAJOR BRAND with no codec — the container's declared flavor
    * (`isom`, `mp42`, `avc1`, …): four ASCII bytes right after the
    * `ftyp` tag at offset 9, fixed by the ISO base-media layout the
    * sniffer already keys on. Non-mp4 or truncated payloads null. */
  def mp4Brand(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sniffFormat(media) === "mp4" && length(media) >= 12,
        decode(substring(media, 9, 4), "UTF-8"))
      .otherwise(lit(null).cast("string"))

  /** Deterministic ftyp-box MP4 payloads with an id-derived major
    * brand — the [[packFakeImages]] pattern for the container case. */
  def packFakeMp4s(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    // 'isom' / 'mp42' alternating by id
    val brandHex = when(pmod(id, lit(2L)) === 0L, lit("69736F6D"))
      .otherwise(lit("6D703432"))
    df.select(id.as("media_id"),
      unhex(concat(lit("0000001866747970"), brandHex, lit("00000200")))
        .as("media"))
  }

  /** Deterministic canonical-header WAV payloads — id-derived
    * channels/rate/length written into genuine RIFF bytes, so
    * [[wavInfo]] exercises real offset parsing and an oracle replays
    * the numbers from the id algebra ([[packFakeImages]] pattern). */
  def packFakeWavs(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val channels = (pmod(id, lit(2L)) + 1L).cast("long")
    val rate = (lit(8000L) + pmod(id, lit(5L)) * 8000L).cast("long")
    val byteRate = rate * channels * 2L
    val dataLen = (pmod(id, lit(1000L)) * 2L + 2L).cast("long")
    def le(v: org.apache.spark.sql.Column, len: Int) =
      concat((0 until len).map(i =>
        lpad(hex(shiftright(v, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
    val hexStr = concat(
      lit("52494646"), le(dataLen + 36L, 4), lit("57415645"),
      lit("666D7420"), le(lit(16L), 4), le(lit(1L), 2), le(channels, 2),
      le(rate, 4), le(byteRate, 4), le(channels * 2L, 2), le(lit(16L), 2),
      lit("64617461"), le(dataLen, 4))
    df.select(id.as("media_id"), unhex(hexStr).as("media"))
  }

  // ------------------------------------------------------------------
  // REAL WAV PCM sample decode — the audio twin of [[decodePng]]:
  // PCM is not a codec (the samples ARE the bytes, 16-bit LE), so a
  // RIFF chunk walk + LE reads give real sample access with zero
  // dependencies. This retires the decode stub for WAV/PCM the way
  // r10's decodePng retired it for PNG; only genuinely-entropy-coded
  // formats (JPEG, MP3) remain stubbed.
  // ------------------------------------------------------------------

  /** Build a REAL, complete mono 16-bit PCM WAV at `rate` Hz with
    * sample i = `sample(i)` — genuine RIFF/fmt/data chunks, playable
    * by any audio tool. */
  private[graft] def buildWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** REAL WAV sample decode: RIFF chunk walk (word-aligned, as the
    * spec requires) → `fmt ` must declare PCM 16-bit → `data` chunk
    * bytes as LE 16-bit samples (interleaved when multi-channel).
    * Returns (sampleRate, channels, samples) or None for anything
    * non-WAV / non-PCM16 / truncated (a decode must screen, not
    * throw, over a crawled corpus). */
  private[graft] def decodeWavSamples(bytes: Array[Byte])
      : Option[(Int, Int, Array[Short])] =
    try {
      if (bytes.length < 12 ||
          new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
          new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
      def le(off: Int, len: Int): Long = {
        var v = 0L; var i = len - 1
        while (i >= 0) { v = (v << 8) | (bytes(off + i) & 0xffL); i -= 1 }
        v
      }
      var off = 12
      var rate = -1; var channels = -1; var ok = false
      var data: Option[(Int, Int)] = None // (offset, len)
      while (off + 8 <= bytes.length) {
        val tag = new String(bytes, off, 4, "US-ASCII")
        val len = le(off + 4, 4).toInt
        if (len < 0 || off + 8 + len > bytes.length) return None
        tag match {
          case "fmt " if len >= 16 =>
            val fmt = le(off + 8, 2).toInt
            channels = le(off + 10, 2).toInt
            rate = le(off + 12, 4).toInt
            val bits = le(off + 22, 2).toInt
            ok = fmt == 1 && bits == 16 && channels >= 1
          case "data" => data = Some((off + 8, len))
          case _ => ()
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (!ok) return None
      data.map { case (dOff, dLen) =>
        val n = dLen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = ((bytes(dOff + 2 * i) & 0xff) |
            (bytes(dOff + 2 * i + 1) << 8)).toShort
          i += 1
        }
        (rate, channels, samples)
      }
    } catch { case _: Exception => None }

  /** Deterministic REAL WAVs from an id column: rate, length, and
    * every sample derive from the id (sample i =
    * ((id·37 + i·101) mod 65536) − 32768 — replayable by any engine
    * as integer algebra, full-range including clipping-region
    * values), so the decode oracle never touches audio bytes. */
  def packRealWavs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val rate = (8000L + (id % 5) * 8000L).toInt
      val n = (id % 64 + 16).toInt
      (id, buildWav(rate, Array.tabulate(n)(i =>
        ((id * 37 + i.toLong * 101) % 65536 - 32768).toShort)))
    }.toDF("media_id", "media")
  }

  /** EXACT sample statistics through the real PCM decode — the
    * operators an audio-data pipeline gates on (silence screens,
    * clipping detection, loudness-weighted sampling): per payload,
    * sample rate, sample count, exact integer |s| sum and s² sum
    * (energy), peak |s|, and the counts of clipped (|s| ≥ 32000) and
    * near-silent (|s| < 1024) samples. Partition-parallel
    * mapPartitions over the binary column; undecodable payloads are
    * screened out (no rows), not thrown. */
  def wavSampleStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeWavSamples(bytes).map { case (rate, _, samples) =>
            var sumAbs = 0L; var sumSq = 0L; var peak = 0L
            var clipped = 0L; var silent = 0L
            var i = 0
            while (i < samples.length) {
              val s = samples(i).toLong
              val a = math.abs(s)
              sumAbs += a; sumSq += s * s
              if (a > peak) peak = a
              if (a >= 32000) clipped += 1
              if (a < 1024) silent += 1
              i += 1
            }
            (id, rate.toLong, samples.length.toLong, sumAbs, sumSq,
              peak, clipped, silent)
          }
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "sum_abs", "sum_sq",
        "peak_abs", "n_clipped", "n_silent")
  }

  // ------------------------------------------------------------------
  // REAL PNG pixel decode (VERDICT r9 item 6) — no codec library:
  // stored PNG image data is zlib (java.util.zip.Inflater) wrapping
  // filtered scanlines, and the five filter predictors (None/Sub/Up/
  // Average/Paeth) are ~30 lines of the published spec. This retires
  // the pixel-decode stub for PNG: real byte-exact pixel access with
  // the same partition-parallel batch shape as the metadata parsers.
  // JPEG stays stubbed (a DCT entropy decoder is a codec).
  // ------------------------------------------------------------------

  /** Build a REAL, complete PNG (8-bit grayscale, all chunks, CRCs,
    * zlib IDAT) with pixel (x, y) = `pix(x, y)` and scanline r
    * filtered with type `filterFor(r)` — exercising every unfilter
    * path a spec-conformant decoder must implement. */
  private[graft] def buildPng(w: Int, h: Int, pix: (Int, Int) => Int,
      filterFor: Int => Int): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = tag.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    // raw scanlines → per-row filter transform (the encode side of
    // the five predictors; bpp = 1 for 8-bit grayscale)
    val raw = Array.tabulate(h, w)((y, x) => (pix(x, y) & 0xff).toByte)
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val f = filterFor(y) % 5
      filtered.write(f)
      for (x <- 0 until w) {
        val cur = raw(y)(x) & 0xff
        val left = if (x > 0) raw(y)(x - 1) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val ul = if (x > 0 && y > 0) raw(y - 1)(x - 1) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val zBuf = new Array[Byte](filtered.size() + 64)
    val zLen = deflater.deflate(zBuf)
    deflater.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, grayscale, deflate, adaptive, no interlace
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zBuf.take(zLen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Complete PNG encode for raw row-major pixels, bpp ∈ {1, 3, 4}
    * (grayscale / truecolor / truecolor-alpha), filter type 0 on
    * every scanline (a spec-conformant encoder choice; [[buildPng]]
    * keeps exercising the other four on the DECODE side). Robust
    * deflate loop — no fixed-slack buffer — so incompressible pixel
    * data round-trips too. */
  private[graft] def encodePng(w: Int, h: Int, bpp: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * bpp,
      s"encodePng: ${pixels.length} bytes != $w*$h*$bpp")
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = tag.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val colorType = bpp match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case other =>
        throw new IllegalArgumentException(s"encodePng: bpp $other")
    }
    val rowBytes = w * bpp
    val filtered = new Array[Byte]((rowBytes + 1) * h)
    for (y <- 0 until h) {
      // filter byte 0 (None) then the raw scanline
      System.arraycopy(pixels, y * rowBytes,
        filtered, y * (rowBytes + 1) + 1, rowBytes)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Route to the right REAL decoder by magic bytes: PNG →
    * [[decodePng]]; GIF → [[decodeGif]] (gray, bpp 1); BMP →
    * [[decodeBmp]]; JPEG → [[decodeJpeg]] (r17 — baseline
    * sequential, real Huffman + IDCT). One decode surface for every
    * image container the engine decodes for real. */
  private[graft] def decodeImage(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x89) decodePng(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'G' && bytes(1) == 'I')
      decodeGif(bytes).map { case (w, h, gray) => (w, h, 1, gray) }
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      decodeBmp(bytes).map { case (w, h, gray) => (w, h, 1, gray) }
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8) decodeJpeg(bytes)
    else None

  /** REAL image resize — retires the image leg of [[resizeStub]]:
    * real decode ([[decodeImage]] — PNG or GIF) → nearest-neighbor
    * resample (source pixel (x·srcW div dstW, y·srcH div dstH) — pure
    * integer algebra, so an external oracle replays every output
    * pixel) → real re-encode as PNG ([[encodePng]]; GIF inputs are
    * transcoded — the normalize-on-resize shape a vision pipeline
    * wants anyway). Channel count is preserved. Partition-parallel
    * mapPartitions, the same batch shape as every decode stage;
    * undecodable payloads are screened out, not thrown. */
  def resizeImage(spark: SparkSession, packed: DataFrame,
      w: Int, h: Int): DataFrame = {
    import spark.implicits._
    require(w > 0 && h > 0, s"resizeImage: target ${w}x$h")
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { case (sw, sh, bpp, pix) =>
            val out = new Array[Byte](w * h * bpp)
            var y = 0
            while (y < h) {
              val sy = y * sh / h
              var x = 0
              while (x < w) {
                val sx = x * sw / w
                var c = 0
                while (c < bpp) {
                  out((y * w + x) * bpp + c) = pix((sy * sw + sx) * bpp + c)
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            (id, encodePng(w, h, bpp, out))
          }
        }
      }.toDF("media_id", "media")
  }

  /** PNG-only name kept for the x117 surface; [[resizeImage]] is the
    * general form (PNG in → PNG out is a strict subset). */
  def resizePng(spark: SparkSession, packed: DataFrame,
      w: Int, h: Int): DataFrame = resizeImage(spark, packed, w, h)

  /** The Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG pixel decode: chunk walk → IHDR dims → concatenated
    * IDAT through `Inflater` → per-scanline unfilter (all five
    * predictor types). Supports 8-bit grayscale (bpp 1), truecolor
    * (bpp 3) and truecolor-alpha (bpp 4), non-interlaced — the
    * overwhelmingly common lake storage shapes. Returns
    * (width, height, bytesPerPixel, pixels row-major) or None for
    * anything malformed/unsupported (a decode must screen, not
    * throw, over a crawled corpus). */
  private[graft] def decodePng(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] =
    try {
      val magic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (bytes.length < 8 || !bytes.take(8).sameElements(magic)) return None
      def be32(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      var off = 8
      var w = -1; var h = -1; var depth = -1; var color = -1
      val idat = new java.io.ByteArrayOutputStream()
      while (off + 8 <= bytes.length) {
        val len = be32(off).toInt
        val tag = new String(bytes, off + 4, 4, "US-ASCII")
        if (off + 8 + len > bytes.length) return None
        tag match {
          case "IHDR" =>
            w = be32(off + 8).toInt; h = be32(off + 12).toInt
            depth = bytes(off + 16) & 0xff; color = bytes(off + 17) & 0xff
            if ((bytes(off + 20) & 0xff) != 0) return None // interlaced
          case "IDAT" => idat.write(bytes, off + 8, len)
          case _ => ()
        }
        off += 8 + len + 4 // data + crc
      }
      val bpp = (depth, color) match {
        case (8, 0) => 1
        case (8, 2) => 3
        case (8, 6) => 4
        case _ => return None
      }
      if (w <= 0 || h <= 0) return None
      val rowBytes = w * bpp
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val filtered = new Array[Byte]((rowBytes + 1) * h)
      var got = 0
      while (got < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated
        got += n
      }
      inflater.end()
      if (got < filtered.length) return None
      // unfilter in place into the pixel buffer
      val out = new Array[Byte](rowBytes * h)
      for (y <- 0 until h) {
        val f = filtered(y * (rowBytes + 1)) & 0xff
        if (f > 4) return None
        val src = y * (rowBytes + 1) + 1
        val dst = y * rowBytes
        for (i <- 0 until rowBytes) {
          val x = filtered(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (y > 0) out(dst - rowBytes + i) & 0xff else 0
          val ul = if (y > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          out(dst + i) = ((x + pred) & 0xff).toByte
        }
      }
      Some((w, h, bpp, out))
    } catch { case _: Exception => None }

  /** Deterministic REAL PNGs from an id column: dims and every pixel
    * derive from the id ((id·31 + x·7 + y·13) mod 256 — replayable by
    * any engine as integer algebra, no decoder needed on the oracle
    * side), scanline r filtered with type (id + r) mod 5 so the
    * corpus exercises ALL five predictors. */
  def packRealPngs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 16 + 4).toInt
      val h = ((id * 7) % 12 + 4).toInt
      (id, buildPng(w, h,
        (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt,
        r => ((id + r) % 5).toInt))
    }.toDF("media_id", "media")
  }

  /** EXACT pixel statistics through the real decode — the operator a
    * vision-data pipeline gates on (brightness screens, constant-
    * frame detection, resolution-weighted sampling): per image,
    * dimensions, exact integer pixel sum, max, and the count of
    * bright (>127) pixels. Partition-parallel mapPartitions over the
    * binary column, same shape as every decode stage; undecodable
    * payloads are screened out (no rows), not thrown. */
  def pngPixelStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePng(bytes).map { case (w, h, bpp, pix) =>
            var sum = 0L; var mx = 0L; var bright = 0L
            var i = 0
            while (i < pix.length) {
              val v = pix(i) & 0xff
              sum += v
              if (v > mx) mx = v
              if (v > 127) bright += 1
              i += 1
            }
            (id, w.toLong, h.toLong, pix.length.toLong / bpp, sum, mx, bright)
          }
        }
      }
      .toDF("media_id", "width", "height", "n_pixels", "sum_pixels",
        "max_pixel", "n_bright")
  }

  // ------------------------------------------------------------------
  // REAL GIF pixel decode — the third real-decode leg (PNG r10,
  // WAV r11): GIF image data is LZW with variable code width
  // (9→12 bits, LSB-first, clear/EOI codes — the published GIF87a/89a
  // spec), which is ~60 lines of table-driven code, no codec library.
  // The encoder below is a REAL LZW compressor (dictionary, width
  // growth, table-full clear), so the decoder's table-growth and
  // KwKwK paths are exercised by genuinely compressed streams.
  // ------------------------------------------------------------------

  /** LZW-compress 8-bit indices as GIF image data (min code size 8):
    * real dictionary compression with code-width growth and the
    * table-full clear, bit-packed LSB-first. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var width = 9
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    val clear = 256; val eoi = 257
    var dict = scala.collection.mutable.HashMap[(Int, Int), Int]()
    var next = 258
    emit(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        dict.get((cur, b)) match {
          case Some(code) => cur = code
          case None =>
            emit(cur)
            if (next == 4096) { // table full: clear, reset
              emit(clear)
              dict = scala.collection.mutable.HashMap[(Int, Int), Int]()
              next = 258; width = 9
            } else {
              dict((cur, b)) = next
              // the decoder is one addition behind, so width grows
              // when the JUST-ADDED code value reaches 2^width
              if (next == (1 << width) && width < 12) width += 1
              next += 1
            }
            cur = b
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** LZW-decompress GIF image data (min code size 8): full variable-
    * width decode with clear/EOI and the KwKwK case. Returns None on
    * any malformed stream. */
  private def lzwDecode(data: Array[Byte], maxPixels: Int)
      : Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val clear = 256; val eoi = 257
    var width = 9; var next = 258
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    def entryBytes(code: Int): Array[Byte] = {
      var c = code; val buf = scala.collection.mutable.ArrayBuffer[Byte]()
      while (c >= 256) { buf += suffix(c); c = prefix(c) }
      buf += c.toByte
      buf.reverse.toArray
    }
    var acc = 0L; var nbits = 0; var pos = 0; var prev = -1
    while (true) {
      while (nbits < width) {
        if (pos >= data.length) return None // ran out before EOI
        acc |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nbits -= width
      if (code == eoi) return Some(out.toByteArray)
      else if (code == clear) { next = 258; width = 9; prev = -1 }
      else if (prev == -1) {
        if (code > 255) return None // first code must be a literal
        out.write(code); prev = code
      } else {
        if (code > next || (code == next && next == 4096)) return None
        val entry =
          if (code < next) entryBytes(code)
          else { val p = entryBytes(prev); p :+ p(0) } // KwKwK
        out.write(entry, 0, entry.length)
        if (out.size() > maxPixels) return None // oversize vs header
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = entry(0)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    None // unreachable
  }

  /** Build a REAL, complete GIF89a (8-bit, 256-entry grayscale global
    * color table, genuinely LZW-compressed image data in ≤255-byte
    * sub-blocks) with pixel (x, y) = `pix(x, y)`. */
  private[graft] def buildGif(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // global color table, 8 bits, 256 entries
    out.write(0); out.write(0) // bg color, aspect
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW min code size
    val lzw = lzwEncode(
      Array.tabulate(w * h)(i => (pix(i % w, i / w) & 0xff).toByte))
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** REAL GIF pixel decode: header walk (logical screen descriptor,
    * global/local color tables, extension skip) → sub-block
    * reassembly → full LZW decode → palette lookup to gray
    * (ITU-R 601 integer luma (299r + 587g + 114b) div 1000, exact
    * integer algebra). First frame, non-interlaced, 8-bit min code
    * size — the common lake shapes; anything else screens to None. */
  private[graft] def decodeGif(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] =
    try {
      if (bytes.length < 13) return None
      val hdr = new String(bytes, 0, 6, "US-ASCII")
      if (hdr != "GIF89a" && hdr != "GIF87a") return None
      def u16(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      var off = 6
      val sw = u16(off); val sh = u16(off + 2)
      val packed = bytes(off + 4) & 0xff
      off += 7
      var palette: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (off + n * 3 > bytes.length) return None
        palette = java.util.Arrays.copyOfRange(bytes, off, off + n * 3)
        off += n * 3
      }
      while (off < bytes.length) {
        (bytes(off) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            off += 2
            while (off < bytes.length && (bytes(off) & 0xff) != 0)
              off += 1 + (bytes(off) & 0xff)
            off += 1
          case 0x2C => // image descriptor
            if (off + 10 > bytes.length) return None
            val iw = u16(off + 5); val ih = u16(off + 7)
            val ipacked = bytes(off + 9) & 0xff
            if ((ipacked & 0x40) != 0) return None // interlaced
            off += 10
            if ((ipacked & 0x80) != 0) { // local color table wins
              val n = 2 << (ipacked & 7)
              if (off + n * 3 > bytes.length) return None
              palette = java.util.Arrays.copyOfRange(bytes, off, off + n * 3)
              off += n * 3
            }
            if (palette == null || off >= bytes.length) return None
            if ((bytes(off) & 0xff) != 8) return None // min code size
            off += 1
            val lzw = new java.io.ByteArrayOutputStream()
            while (off < bytes.length && (bytes(off) & 0xff) != 0) {
              val n = bytes(off) & 0xff
              if (off + 1 + n > bytes.length) return None
              lzw.write(bytes, off + 1, n)
              off += 1 + n
            }
            if (iw <= 0 || ih <= 0 || iw > sw * 16 || ih > sh * 16)
              return None
            return lzwDecode(lzw.toByteArray, iw * ih).flatMap { idx =>
              if (idx.length != iw * ih) None
              else {
                val nPal = palette.length / 3
                val gray = new Array[Byte](idx.length)
                var i = 0
                while (i < idx.length) {
                  val p = idx(i) & 0xff
                  if (p >= nPal) return None
                  val r = palette(p * 3) & 0xff
                  val g = palette(p * 3 + 1) & 0xff
                  val b = palette(p * 3 + 2) & 0xff
                  gray(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
                  i += 1
                }
                Some((iw, ih, gray))
              }
            }
          case 0x3B => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch { case _: Exception => None }

  /** Deterministic REAL GIFs from an id column ([[packRealPngs]]
    * pattern): dims and every pixel derive from the id
    * ((id·29 + x·11 + y·17) mod 256, identity grayscale palette — so
    * the decoded gray equals the index and any engine replays the
    * stats as integer algebra). */
  def packRealGifs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 14 + 4).toInt
      val h = ((id * 5) % 10 + 4).toInt
      (id, buildGif(w, h, (x, y) => ((id * 29 + x * 11 + y * 17) % 256).toInt))
    }.toDF("media_id", "media")
  }

  /** EXACT pixel statistics through the real GIF decode — the
    * [[pngPixelStats]] screens for the second image container:
    * dimensions, exact integer gray sum, max, bright (>127) count.
    * Undecodable payloads are screened out, not thrown. */
  def gifPixelStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGif(bytes).map { case (w, h, gray) =>
            var sum = 0L; var mx = 0L; var bright = 0L
            var i = 0
            while (i < gray.length) {
              val v = gray(i) & 0xff
              sum += v
              if (v > mx) mx = v
              if (v > 127) bright += 1
              i += 1
            }
            (id, w.toLong, h.toLong, gray.length.toLong, sum, mx, bright)
          }
        }
      }
      .toDF("media_id", "width", "height", "n_pixels", "sum_pixels",
        "max_pixel", "n_bright")
  }

  // ------------------------------------------------------------------
  // REAL BMP pixel decode — the fourth real-decode leg: BMP stores
  // raw pixels (bottom-up scanlines, BGR byte order, rows padded to
  // 4 bytes), so decode is pure offset arithmetic from the published
  // BITMAPINFOHEADER layout. With BMP done, every NON-entropy-coded
  // format the sniffer knows decodes for real; only true codecs
  // (JPEG, MP3) remain contract stubs.
  // ------------------------------------------------------------------

  /** Build a REAL, complete 24-bit BMP with pixel (x, y) (top-down
    * coordinates) = gray `pix(x, y)` written as (B, G, R) into the
    * spec's bottom-up padded scanlines. */
  private[graft] def buildBmp(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val dataLen = rowBytes * h
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, positive h = bottom-up
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(dataLen) // no compression
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val y = h - 1 - row // bottom-up storage
      for (x <- 0 until w) {
        val v = (pix(x, y) & 0xff).toByte
        out.put(v).put(v).put(v) // B, G, R
      }
      for (_ <- w * 3 until rowBytes) out.put(0.toByte)
    }
    out.array()
  }

  /** REAL BMP pixel decode: header offsets → dims/bpp → bottom-up
    * padded scanline walk → gray via integer luma (identity on the
    * grayscale corpora). Supports uncompressed 24-bit with positive
    * height — the overwhelmingly common shape; anything else screens
    * to None. Returns (width, height, gray row-major top-down). */
  private[graft] def decodeBmp(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] =
    try {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      def le(off: Int, len: Int): Long = {
        var v = 0L; var i = len - 1
        while (i >= 0) { v = (v << 8) | (bytes(off + i) & 0xffL); i -= 1 }
        v
      }
      val dataOff = le(10, 4).toInt
      val w = le(18, 4).toInt
      val h = le(22, 4).toInt // negative would mean top-down; screen it
      val bpp = le(28, 2).toInt
      val compression = le(30, 4).toInt
      if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
      val rowBytes = (w * 3 + 3) & ~3
      if (dataOff + rowBytes * h > bytes.length) return None
      val gray = new Array[Byte](w * h)
      var row = 0
      while (row < h) {
        val y = h - 1 - row
        var x = 0
        while (x < w) {
          val p = dataOff + row * rowBytes + x * 3
          val b = bytes(p) & 0xff
          val g = bytes(p + 1) & 0xff
          val r = bytes(p + 2) & 0xff
          gray(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          x += 1
        }
        row += 1
      }
      Some((w, h, gray))
    } catch { case _: Exception => None }

  /** Deterministic REAL BMPs from an id column ([[packRealPngs]]
    * pattern): w = id mod 12 + 4, h = (id·3) mod 9 + 4, pixel
    * (id·23 + x·13 + y·19) mod 256. */
  def packRealBmps(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = (id % 12 + 4).toInt
      val h = ((id * 3) % 9 + 4).toInt
      (id, buildBmp(w, h, (x, y) => ((id * 23 + x * 13 + y * 19) % 256).toInt))
    }.toDF("media_id", "media")
  }

  /** EXACT pixel statistics through the real BMP decode — the
    * [[pngPixelStats]] screens for the third image container. */
  def bmpPixelStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeBmp(bytes).map { case (w, h, gray) =>
            var sum = 0L; var mx = 0L; var bright = 0L
            var i = 0
            while (i < gray.length) {
              val v = gray(i) & 0xff
              sum += v
              if (v > mx) mx = v
              if (v > 127) bright += 1
              i += 1
            }
            (id, w.toLong, h.toLong, gray.length.toLong, sum, mx, bright)
          }
        }
      }
      .toDF("media_id", "width", "height", "n_pixels", "sum_pixels",
        "max_pixel", "n_bright")
  }

  // ------------------------------------------------------------------
  // REAL baseline JPEG pixel decode (r17 — retiring the last image
  // stub; the majority crawl image format): marker walk → DQT / DHT /
  // SOF0 / SOS → Huffman entropy decode (DC DPCM + AC run/size, byte
  // stuffing, restart markers) → dequant → separable orthonormal
  // IDCT → level shift; grayscale and YCbCr with arbitrary sampling
  // factors (nearest upsample) → RGB. Baseline sequential (ITU T.81)
  // only: progressive (SOF2), arithmetic coding, 12-bit precision and
  // hierarchical modes SCREEN to None like every other undecodable
  // payload. The encoder below emits genuinely Huffman-coded streams
  // (standard Annex K tables), so the decoder's category/run-length
  // paths are exercised by real entropy data.
  // ------------------------------------------------------------------

  /** The T.81 zig-zag scan order (coefficient index per scan pos). */
  private val jpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Orthonormal DCT-II basis `C(u)/2 · cos((2x+1)uπ/16)` — rows are
    * orthonormal, so IDCT = Cᵀ F C and FDCT = C P Cᵀ with the SAME
    * table (StrictMath: bit-identical across JVMs; a DC-only block
    * reconstructs its constant EXACTLY after rounding, which is what
    * makes the block-constant fixture oracle-replayable). */
  private val jpegCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
    0.5 * cu * StrictMath.cos((2 * x + 1) * u * Math.PI / 16.0)
  }

  /** Entropy-data bit reader: MSB-first, 0xFF00 byte stuffing; any
    * bare marker inside entropy data is a malformed stream (restart
    * markers are consumed explicitly via [[expectRst]]). Decode
    * errors throw (caught into the decode's screening None). */
  private final class JpegBitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def align(): Unit = { acc = 0; nbits = 0 }
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("eof")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new IllegalArgumentException("eof")
          if ((data(pos) & 0xff) == 0) pos += 1 // stuffed 0xFF data byte
          else throw new IllegalArgumentException("marker in scan")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def expectRst(idx: Int): Unit = {
      align()
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff ||
          (data(pos + 1) & 0xff) != (0xd0 + idx))
        throw new IllegalArgumentException("missing RST")
      pos += 2
    }
  }

  /** Canonical Huffman table (T.81 Annex C): BITS counts per code
    * length 1..16 + values in code order. */
  private final class JpegHuff(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        code <<= 1
        l += 1
      }
    }
    def decode(r: JpegBitReader): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        code = (code << 1) | r.readBit(); l += 1
        if (bits(l - 1) > 0 && code >= minCode(l) && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
      }
      throw new IllegalArgumentException("bad huffman code")
    }
    /** value → (code, length) for the encoder side. */
    lazy val codeOf: Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) { m += (vals(k) -> ((code, l))); code += 1; k += 1; i += 1 }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** REAL baseline JPEG pixel decode. Returns
    * (width, height, bytesPerPixel, pixels row-major) — bpp 1 (gray)
    * for one-component streams, bpp 3 (RGB, JFIF YCbCr converted) for
    * three-component ones; None for anything malformed or outside
    * baseline sequential. */
  private[graft] def decodeJpeg(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] =
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
          (bytes(1) & 0xff) != 0xd8) return None
      val qt = Array.ofDim[Int](4, 64) // natural order
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var w = 0; var h = 0
      var compIds: Array[Int] = null   // SOF order
      var compH: Array[Int] = null
      var compV: Array[Int] = null
      var compQ: Array[Int] = null
      var compDc: Array[Int] = null
      var compAc: Array[Int] = null
      var restart = 0
      var scanStart = -1
      var pos = 2
      def u16(p: Int) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      while (scanStart < 0) {
        while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) pos += 1
        while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
        if (pos >= bytes.length) return None
        val marker = bytes(pos) & 0xff; pos += 1
        marker match {
          case 0xd9 => return None // EOI before any scan
          case m if m >= 0xd0 && m <= 0xd7 => () // stray RST: skip
          case 0x01 => ()
          case 0xc0 | 0xc1 => // baseline / extended sequential
            val len = u16(pos)
            if ((bytes(pos + 2) & 0xff) != 8) return None // 12-bit
            h = u16(pos + 3); w = u16(pos + 5)
            val n = bytes(pos + 7) & 0xff
            if (w <= 0 || h <= 0 || (n != 1 && n != 3)) return None
            compIds = new Array[Int](n); compH = new Array[Int](n)
            compV = new Array[Int](n); compQ = new Array[Int](n)
            compDc = new Array[Int](n); compAc = new Array[Int](n)
            var i = 0
            while (i < n) {
              val o = pos + 8 + i * 3
              compIds(i) = bytes(o) & 0xff
              compH(i) = (bytes(o + 1) & 0xff) >> 4
              compV(i) = bytes(o + 1) & 0x0f
              compQ(i) = bytes(o + 2) & 0xff
              if (compH(i) < 1 || compH(i) > 4 || compV(i) < 1 ||
                compV(i) > 4 || compQ(i) > 3) return None
              i += 1
            }
            pos += len
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // progressive / arithmetic / hierarchical
          case 0xc4 => // DHT: possibly several tables in one segment
            val len = u16(pos)
            var p = pos + 2
            while (p < pos + len) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
              val tab = new JpegHuff(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + nv
            }
            pos += len
          case 0xdb => // DQT: 8- or 16-bit precision, natural-order store
            val len = u16(pos)
            var p = pos + 2
            while (p < pos + len) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              if (pq > 1 || tq > 3) return None
              var i = 0
              while (i < 64) {
                val v = if (pq == 0) bytes(p + 1 + i) & 0xff
                  else u16(p + 1 + i * 2)
                qt(tq)(jpegZigzag(i)) = v
                i += 1
              }
              p += 1 + (if (pq == 0) 64 else 128)
            }
            pos += len
          case 0xdd =>
            restart = u16(pos + 2); pos += u16(pos)
          case 0xda =>
            val len = u16(pos)
            val ns = bytes(pos + 2) & 0xff
            if (compIds == null || ns != compIds.length) return None
            var i = 0
            while (i < ns) {
              val o = pos + 3 + i * 2
              val cid = bytes(o) & 0xff
              val ci = compIds.indexOf(cid)
              if (ci < 0) return None
              compDc(ci) = (bytes(o + 1) & 0xff) >> 4
              compAc(ci) = bytes(o + 1) & 0x0f
              i += 1
            }
            scanStart = pos + len
          case _ => // APPn / COM / anything else: skip by length
            pos += u16(pos)
        }
      }
      val n = compIds.length
      val hMax = compH.max; val vMax = compV.max
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      // padded component planes, filled block by block
      val planeW = new Array[Int](n); val planes = new Array[Array[Byte]](n)
      var ci = 0
      while (ci < n) {
        planeW(ci) = mcusX * compH(ci) * 8
        planes(ci) = new Array[Byte](planeW(ci) * mcusY * compV(ci) * 8)
        ci += 1
      }
      val reader = new JpegBitReader(bytes, scanStart)
      val preds = new Array[Int](n)
      val coef = new Array[Double](64)
      val g = new Array[Double](64)
      var mcu = 0
      var rstIdx = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restart > 0 && mcu > 0 && mcu % restart == 0) {
          reader.expectRst(rstIdx); rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        val my = mcu / mcusX; val mx = mcu % mcusX
        ci = 0
        while (ci < n) {
          val dc = dcTabs(compDc(ci)); val ac = acTabs(compAc(ci))
          if (dc == null || ac == null) return None
          val q = qt(compQ(ci))
          var by = 0
          while (by < compV(ci)) {
            var bx = 0
            while (bx < compH(ci)) {
              java.util.Arrays.fill(coef, 0.0)
              val t = dc.decode(reader)
              if (t > 15) return None
              preds(ci) += jpegExtend(reader.readBits(t), t)
              coef(0) = preds(ci).toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = ac.decode(reader)
                val r = rs >> 4; val s2 = rs & 15
                if (s2 == 0) { if (r == 15) k += 16 else k = 64 }
                else {
                  k += r
                  if (k > 63) return None
                  coef(jpegZigzag(k)) =
                    jpegExtend(reader.readBits(s2), s2).toDouble *
                      q(jpegZigzag(k))
                  k += 1
                }
              }
              // separable IDCT: rows (over u), then columns (over v)
              var v = 0
              while (v < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0; var u = 0
                  while (u < 8) { s += coef(v * 8 + u) * jpegCos(u)(x); u += 1 }
                  g(v * 8 + x) = s
                  x += 1
                }
                v += 1
              }
              val plane = planes(ci); val pw = planeW(ci)
              val px0 = (mx * compH(ci) + bx) * 8
              val py0 = (my * compV(ci) + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0; v = 0
                  while (v < 8) { s += g(v * 8 + x) * jpegCos(v)(y); v += 1 }
                  val p0 = Math.round(s).toInt + 128
                  plane((py0 + y) * pw + px0 + x) =
                    (if (p0 < 0) 0 else if (p0 > 255) 255 else p0).toByte
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      if (n == 1) {
        val out = new Array[Byte](w * h)
        val pw = planeW(0)
        var y = 0
        while (y < h) {
          System.arraycopy(planes(0), y * pw, out, y * w, w)
          y += 1
        }
        Some((w, h, 1, out))
      } else {
        // nearest upsample each chroma plane to the luma grid + the
        // JFIF fixed-point YCbCr→RGB
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            def sample(c: Int): Int = {
              val sx = x * compH(c) / hMax
              val sy = y * compV(c) / vMax
              planes(c)(sy * planeW(c) + sx) & 0xff
            }
            val yy = sample(0).toDouble
            val cb = sample(1) - 128.0
            val cr = sample(2) - 128.0
            def clamp(d: Double): Byte = {
              val i = Math.round(d).toInt
              (if (i < 0) 0 else if (i > 255) 255 else i).toByte
            }
            val o = (y * w + x) * 3
            out(o) = clamp(yy + 1.402 * cr)
            out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
            out(o + 2) = clamp(yy + 1.772 * cb)
            x += 1
          }
          y += 1
        }
        Some((w, h, 3, out))
      }
    } catch { case _: Exception => None }

  // ---- JPEG encoder (real Huffman entropy coding) ------------------

  /** Standard Annex K luminance DC table (BITS, HUFFVAL). */
  private val jpegStdDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val jpegStdDcVals = Array.tabulate(12)(identity)
  /** Standard Annex K luminance AC table. */
  private val jpegStdAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val jpegStdAcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private lazy val jpegDcHuff = new JpegHuff(jpegStdDcBits, jpegStdDcVals)
  private lazy val jpegAcHuff = new JpegHuff(jpegStdAcBits, jpegStdAcVals)

  /** Entropy-data bit writer: MSB-first, 0xFF00 stuffing, 1-padded
    * flush (T.81 byte alignment rule). */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0)
      acc = 0; nbits = 0
    }
  }

  private def jpegCategory(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def jpegPutCoeff(bw: JpegBitWriter, huff: JpegHuff,
      runSize: Int, v: Int, t: Int): Unit = {
    val (code, len) = huff.codeOf(runSize)
    bw.put(code, len)
    if (t > 0) bw.put(if (v < 0) v - 1 + (1 << t) else v, t)
  }

  /** Assemble a baseline JPEG from already-quantized coefficient
    * blocks. `blocks(comp)(blockIdx)` are natural-order quantized
    * coefficients; interleaved MCU emission per the sampling factors;
    * all components share quant table 0 / Huffman tables 0. */
  private[graft] def assembleJpeg(w: Int, h: Int, quant: Array[Int],
      sampH: Array[Int], sampV: Array[Int],
      blocks: Array[Array[Array[Int]]], restartInterval: Int)
      : Array[Byte] = {
    val n = sampH.length
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 1 + 64); out.write(0) // DQT, Pq=0, Tq=0
    for (i <- 0 until 64) out.write(quant(jpegZigzag(i)))
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    m(0xc0); u16(8 + 3 * n); out.write(8); u16(h); u16(w); out.write(n)
    for (c <- 0 until n) {
      out.write(c + 1); out.write((sampH(c) << 4) | sampV(c)); out.write(0)
    }
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length); out.write(tc << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, jpegStdDcBits, jpegStdDcVals)
    dht(1, jpegStdAcBits, jpegStdAcVals)
    m(0xda); u16(6 + 2 * n); out.write(n)
    for (c <- 0 until n) { out.write(c + 1); out.write(0) }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl (baseline)
    val hMax = sampH.max; val vMax = sampV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val bw = new JpegBitWriter(out)
    val preds = new Array[Int](n)
    val blockIdx = new Array[Int](n)
    var mcu = 0; var rstIdx = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush(); m(0xd0 + rstIdx); rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      var c = 0
      while (c < n) {
        var b = 0
        while (b < sampH(c) * sampV(c)) {
          val coefs = blocks(c)(blockIdx(c)); blockIdx(c) += 1
          val diff = coefs(0) - preds(c); preds(c) = coefs(0)
          val t = jpegCategory(diff)
          jpegPutCoeff(bw, jpegDcHuff, t, diff, t)
          var run = 0; var k = 1
          while (k < 64) {
            val v = coefs(jpegZigzag(k))
            if (v == 0) run += 1
            else {
              while (run > 15) { jpegPutCoeff(bw, jpegAcHuff, 0xf0, 0, 0); run -= 16 }
              val s = jpegCategory(v)
              jpegPutCoeff(bw, jpegAcHuff, (run << 4) | s, v, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) jpegPutCoeff(bw, jpegAcHuff, 0x00, 0, 0) // EOB
          b += 1
        }
        c += 1
      }
      mcu += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** A REAL grayscale baseline JPEG whose every 8×8 block is the
    * CONSTANT `blockVal(bx, by)` — genuinely Huffman-coded (DC DPCM +
    * EOB per block, standard tables), quant table all-ones, and
    * because a DC-only block IDCTs back to its exact constant, the
    * decode is byte-exact: an external oracle replays pixel stats
    * from the same block-value algebra with no decoder of its own
    * (the [[packRealPngs]]/x109 pattern, extended to the entropy-
    * coded format). `restartInterval` > 0 inserts genuine RSTn
    * markers with predictor resets. */
  private[graft] def buildJpegGrayBlocks(w: Int, h: Int,
      blockVal: (Int, Int) => Int, restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0)
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val blocks = Array.tabulate(bh * bw) { i =>
      val coefs = new Array[Int](64)
      // constant v over the block: shifted s = v − 128, DC = 8s
      // (orthonormal DCT), quantizer 1 ⇒ stored exactly
      coefs(0) = 8 * (blockVal(i % bw, i / bw) - 128)
      coefs
    }
    assembleJpeg(w, h, Array.fill(64)(1), Array(1), Array(1),
      Array(blocks), restartInterval)
  }

  /** FULL real JPEG encode of 8-bit pixels — forward DCT (same
    * orthonormal basis as the decoder), quantization, Huffman entropy
    * coding; grayscale (`bpp` 1) or RGB (`bpp` 3, encoded YCbCr with
    * the given chroma sampling factors and box-filter downsample).
    * The spec suite round-trips this through [[decodeJpeg]] and pins
    * the reconstruction error bound — the honest lossy contract. */
  private[graft] def encodeJpeg(w: Int, h: Int, bpp: Int,
      pix: Array[Byte], quant: Array[Int],
      chromaSampling: (Int, Int) = (1, 1)): Array[Byte] = {
    require(bpp == 1 || bpp == 3)
    def fdctQuant(plane: Array[Byte], pw: Int, ph: Int): Array[Array[Int]] = {
      val bw = (pw + 7) / 8; val bh = (ph + 7) / 8
      Array.tabulate(bh * bw) { i =>
        val bx = i % bw; val by = i / bw
        val s = Array.ofDim[Double](8, 8)
        for (y <- 0 until 8; x <- 0 until 8) {
          val sx = math.min(bx * 8 + x, pw - 1)
          val sy = math.min(by * 8 + y, ph - 1) // edge replicate pad
          s(y)(x) = (plane(sy * pw + sx) & 0xff) - 128.0
        }
        val coefs = new Array[Int](64)
        for (v <- 0 until 8; u <- 0 until 8) {
          var acc = 0.0
          for (y <- 0 until 8; x <- 0 until 8)
            acc += s(y)(x) * jpegCos(v)(y) * jpegCos(u)(x)
          coefs(v * 8 + u) = Math.round(acc / quant(v * 8 + u)).toInt
        }
        coefs
      }
    }
    if (bpp == 1)
      assembleJpeg(w, h, quant, Array(1), Array(1),
        Array(fdctQuant(pix, w, h)), 0)
    else {
      val (ch, cv) = chromaSampling
      // RGB → YCbCr planes (JFIF), chroma box-downsampled by (ch, cv)
      val yP = new Array[Byte](w * h)
      var i = 0
      while (i < w * h) {
        val r = pix(i * 3) & 0xff; val g = pix(i * 3 + 1) & 0xff
        val b = pix(i * 3 + 2) & 0xff
        yP(i) = Math.round(0.299 * r + 0.587 * g + 0.114 * b)
          .toInt.min(255).max(0).toByte
        i += 1
      }
      val cw = (w + ch - 1) / ch; val chh = (h + cv - 1) / cv
      val cbP = new Array[Byte](cw * chh); val crP = new Array[Byte](cw * chh)
      var cy = 0
      while (cy < chh) {
        var cx = 0
        while (cx < cw) {
          var sb = 0.0; var sr = 0.0; var cnt = 0
          var dy = 0
          while (dy < cv) {
            var dx = 0
            while (dx < ch) {
              val x = cx * ch + dx; val y = cy * cv + dy
              if (x < w && y < h) {
                val o = (y * w + x) * 3
                val r = pix(o) & 0xff; val g = pix(o + 1) & 0xff
                val b = pix(o + 2) & 0xff
                sb += -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                sr += 0.5 * r - 0.418688 * g - 0.081312 * b + 128
                cnt += 1
              }
              dx += 1
            }
            dy += 1
          }
          cbP(cy * cw + cx) = Math.round(sb / cnt).toInt.min(255).max(0).toByte
          crP(cy * cw + cx) = Math.round(sr / cnt).toInt.min(255).max(0).toByte
          cx += 1
        }
        cy += 1
      }
      // luma blocks must tile the MCU grid (ch×cv per MCU): pad the
      // luma plane to MCU multiples via fdctQuant's edge replication
      // by computing per-plane block lists sized to the MCU grid
      val mcusX = (w + 8 * ch - 1) / (8 * ch)
      val mcusY = (h + 8 * cv - 1) / (8 * cv)
      def gridBlocks(plane: Array[Byte], pw: Int, ph: Int,
          bxTotal: Int, byTotal: Int, sh: Int, sv: Int): Array[Array[Int]] = {
        val natural = fdctQuant(plane, pw, ph)
        val natW = (pw + 7) / 8
        // re-emit in MCU-interleaved order with edge-block replication
        val outB = Seq.newBuilder[Array[Int]]
        for (my <- 0 until byTotal; mx <- 0 until bxTotal;
             by <- 0 until sv; bx <- 0 until sh) {
          val gx = math.min(mx * sh + bx, natW - 1)
          val gy = math.min(my * sv + by, (ph + 7) / 8 - 1)
          outB += natural(gy * natW + gx)
        }
        outB.result().toArray
      }
      val yBlocks = gridBlocks(yP, w, h, mcusX, mcusY, ch, cv)
      val cbBlocks = gridBlocks(cbP, cw, chh, mcusX, mcusY, 1, 1)
      val crBlocks = gridBlocks(crP, cw, chh, mcusX, mcusY, 1, 1)
      assembleJpeg(w, h, quant, Array(ch, 1, 1), Array(cv, 1, 1),
        Array(yBlocks, cbBlocks, crBlocks), 0)
    }
  }

  /** Deterministic REAL baseline JPEGs from an id column (the
    * [[packRealPngs]] pattern for the entropy-coded format): dims are
    * 8-multiples from the id, every 8×8 block constant
    * `(id·37 + bx·11 + by·19) mod 256` — DC-only blocks round-trip
    * EXACTLY (quant 1), so the oracle replays pixel stats as block
    * algebra. Every third id carries a genuine restart interval. */
  def packRealJpegs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = 8 * (id % 4 + 1).toInt
      val h = 8 * ((id * 5) % 3 + 1).toInt
      (id, buildJpegGrayBlocks(w, h,
        (bx, by) => ((id * 37 + bx * 11 + by * 19) % 256).toInt,
        restartInterval = if (id % 3 == 0) 2 else 0))
    }.toDF("media_id", "media")
  }

  /** Cross-format JPEG↔PNG copy corpus ([[packImageCopies]] for the
    * entropy-coded leg): content key `k = id mod half`, pixels
    * CONSTANT per 8×8 block (`(k·1000003 + bx·131 + by·19)·2654435761
    * mod 251` — the multiplicative rule that keeps aHash buckets
    * honest), id < half packs PNG, id ≥ half packs the SAME pixels as
    * a real baseline JPEG. Because DC-only blocks decode exactly, the
    * two containers decode to IDENTICAL pixels and every pair
    * collapses at Hamming distance 0 — re-encoded-copy dedup across
    * the lossy/lossless container boundary. */
  def packJpegPngCopies(spark: SparkSession, df: DataFrame, idCol: String,
      half: Long): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val k = id % half
      val w = 8 * (k % 3 + 1).toInt
      val h = 8 * ((k * 7) % 4 + 1).toInt
      def bv(bx: Int, by: Int): Int =
        (((k * 1000003L + bx * 131L + by * 19L) * 2654435761L) % 251).toInt
      if (id < half)
        (id, buildPng(w, h, (x, y) => bv(x / 8, y / 8),
          r => ((k + r) % 5).toInt))
      else (id, buildJpegGrayBlocks(w, h, bv))
    }.toDF("media_id", "media")
  }

  /** EXACT pixel statistics through the real JPEG decode — the
    * [[pngPixelStats]] screens for the entropy-coded container. */
  def jpegPixelStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeJpeg(bytes).map { case (w, h, bpp, px) =>
            var sum = 0L; var mx = 0L; var bright = 0L
            var i = 0
            while (i < px.length) {
              val v = px(i) & 0xff
              sum += v
              if (v > mx) mx = v
              if (v > 127) bright += 1
              i += 1
            }
            (id, w.toLong, h.toLong, px.length.toLong / bpp, sum, mx, bright)
          }
        }
      }
      .toDF("media_id", "width", "height", "n_pixels", "sum_pixels",
        "max_pixel", "n_bright")
  }

  /** Byte-level integrity stats — see [[graft.functions.ByteStats]]:
    * the no-codec corruption screen (truncated payloads, constant
    * filler, length mismatches vs declared dimensions). */
  def byteStats(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ByteStats.column(media)

  /** Partition-parallel batched feature extraction over binary
    * payloads. The per-batch `decodeBatch` body is the STUB: a real
    * implementation would hand `batch` to a codec (libjpeg/ffmpeg) and
    * return pixel/spectrogram features; here it returns a
    * deterministic 8-dim byte-statistics vector so the plumbing is
    * testable end to end. */
  def decodeFeaturesStub(spark: SparkSession, packed: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = packed
      .select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB decode: real codec call goes here, one call per batch.
        batch.map { case (id, bytes) =>
          val feats = new Array[Float](8)
          var i = 0
          while (i < bytes.length) {
            feats(i % 8) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
          (id, feats)
        }
      }
    }.toDF("media_id", "features")
  }

  /** Resize stub, same partition-parallel batch shape as
    * [[decodeFeaturesStub]]: a real implementation hands each batch to
    * an image library and returns re-encoded bytes; the stub emits a
    * deterministic `w*h`-byte payload (truncate or cycle-pad) so
    * downstream stages see correctly-sized binaries. Metadata is
    * re-attached with the new dimensions. */
  def resizeStub(spark: SparkSession, packed: DataFrame,
      w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val target = w * h
    val resized = packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // STUB resize: real codec call goes here, one call per batch.
          batch.map { case (id, bytes) =>
            val out = new Array[Byte](target)
            if (bytes.nonEmpty) {
              var i = 0
              while (i < target) { out(i) = bytes(i % bytes.length); i += 1 }
            }
            (id, out)
          }
        }
      }.toDF("media_id", "media")
    resized.join(packed.select(col("media_id"), col("meta").as("__old")), "media_id")
      .withColumn("meta", struct(
        col("__old.format").as("format"),
        lit(w).as("width"), lit(h).as("height"),
        col("__old.n_frames").as("n_frames")))
      .drop("__old")
  }

  /** Build a REAL MP4 box tree — ftyp, a variable-length `free`
    * padding box (so every parser must WALK sizes, never assume
    * offsets), `moov { mvhd, trak { mdia { mdhd } } × n }`, and an
    * `mdat` stub. Box = [BE32 size][4CC type][payload]; mvhd/mdhd are
    * spec-shaped version-0 boxes with real timescale/duration fields
    * and zeroed rate/volume/matrix tails. */
  private[graft] def buildMp4(brand: String, pad: Int, timescale: Long,
      durationTicks: Long, nTracks: Int): Array[Byte] = {
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length)
      out.put(tp.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0x200) ++
        "isommp42".getBytes("US-ASCII"))
    val free = box("free", Array.fill[Byte](pad)(0x55))
    // mvhd v0: version/flags, ctime, mtime, timescale, duration,
    // then rate/volume/reserved/matrix/predefines/nextTrack = 80 bytes
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(durationTicks) ++ Array.fill[Byte](80)(0))
    // mdhd v0: version/flags, ctime, mtime, timescale, duration,
    // language/predefined = 4 bytes
    val mdhd = box("mdhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(durationTicks) ++ Array.fill[Byte](4)(0))
    val trak = box("trak", box("mdia", mdhd))
    val moov = box("moov",
      mvhd ++ (1 to nTracks).flatMap(_ => trak).toArray)
    val mdat = box("mdat", Array.fill[Byte](4)(0x11))
    ftyp ++ free ++ moov ++ mdat
  }

  /** Deterministic full-box-tree MP4s: brand by id parity, `free`
    * padding of `id mod 7` bytes (offset-shifting), timescale
    * `1000·(id mod 4 + 1)`, duration `(id mod 90000) + 100` ticks,
    * `id mod 3 + 1` tracks. */
  def packRealMp4s(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val brand = if (id % 2 == 0) "isom" else "mp42"
      (id, buildMp4(brand, (id % 7).toInt, 1000L * (id % 4 + 1),
        (id % 90000) + 100, (id % 3 + 1).toInt))
    }.toDF("media_id", "media")
  }

  /** REAL MP4 container metadata through a genuine box WALK (sizes
    * honored, unknown/padding boxes skipped, order-independent):
    * major brand from ftyp, movie timescale + duration from
    * moov/mvhd, track count from the moov children — the duration /
    * track-structure screens a video pipeline gates on before any
    * codec work. `duration_ms` is floored integer algebra. Malformed
    * payloads (truncated boxes, missing moov) screen out, not
    * throw. */
  def mp4Info(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            def be32(off: Int): Long =
              ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
                ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
            def tp(off: Int): String = new String(bytes, off + 4, 4, "US-ASCII")
            var brand: Option[String] = None
            var ts = 0L; var dur = 0L; var tracks = 0L
            var sawMoov = false
            var off = 0
            while (off + 8 <= bytes.length) {
              val size = be32(off)
              if (size < 8 || off + size > bytes.length)
                throw new IllegalArgumentException("bad box size")
              tp(off) match {
                case "ftyp" => brand = Some(new String(bytes, off + 8, 4, "US-ASCII"))
                case "moov" =>
                  sawMoov = true
                  var c = off + 8
                  val end = off + size.toInt
                  while (c + 8 <= end) {
                    val cs = be32(c)
                    if (cs < 8 || c + cs > end)
                      throw new IllegalArgumentException("bad child size")
                    tp(c) match {
                      case "mvhd" =>
                        // v0: version/flags, ctime, mtime, ts, duration
                        ts = be32(c + 8 + 12); dur = be32(c + 8 + 16)
                      case "trak" => tracks += 1
                      case _ => ()
                    }
                    c += cs.toInt
                  }
                case _ => () // free / mdat / unknown: skip by size
              }
              off += size.toInt
            }
            if (brand.isEmpty || !sawMoov || ts == 0L) Iterator.empty
            else Iterator.single((id, brand.get, ts, dur,
              dur * 1000L / ts, tracks))
          } catch { case _: Exception => Iterator.empty }
        }
      }
      .toDF("media_id", "brand", "timescale", "duration_ticks",
        "duration_ms", "n_tracks")
  }

  /** Build a REAL ustar TAR archive (the WebDataset shard container):
    * 512-byte headers with octal size/mode fields and the SPEC
    * checksum (header summed with the checksum field as spaces),
    * data padded to block size, two zero blocks at EOF — readable by
    * any tar. */
  private[graft] def buildTar(members: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val hdr = new Array[Byte](512)
      val nameB = name.getBytes("US-ASCII")
      require(nameB.length < 100, s"tar name too long: $name")
      System.arraycopy(nameB, 0, hdr, 0, nameB.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val b = ("%0" + (len - 1) + "o").format(v).getBytes("US-ASCII")
        System.arraycopy(b, 0, hdr, off, b.length)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8) // uid, gid
      oct(data.length.toLong, 124, 12)
      oct(0, 136, 12) // mtime
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      hdr(156) = '0' // regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      hdr(263) = '0'; hdr(264) = '0' // version "00"
      var ck = 0L
      var i = 0
      while (i < 512) { ck += hdr(i) & 0xff; i += 1 }
      val ckb = "%06o".format(ck).getBytes("US-ASCII")
      System.arraycopy(ckb, 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Deterministic WebDataset-style shards: shard id carries
    * `id mod 3 + 2` members named `doc-<id>-<j>.txt`, member j sized
    * `(id·7 + j·13) mod 900 + 10` with byte p = `(id·11 + j·17 +
    * p·5) mod 251` — every offset, size, and byte sum replays as id
    * algebra. */
  def packTarShards(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val members = (0 until (id % 3 + 2).toInt).map { j =>
        val n = ((id * 7 + j * 13) % 900 + 10).toInt
        (s"doc-$id-$j.txt", Array.tabulate(n)(p =>
          ((id * 11 + j * 17 + p.toLong * 5) % 251).toByte))
      }
      (id, buildTar(members))
    }.toDF("media_id", "media")
  }

  /** Walk a ustar archive's headers: Some(members as (name, absolute
    * data offset, size)) — or None when any header fails its SPEC
    * checksum, an octal field is malformed, or a member claims bytes
    * past the end (a corrupt shard screens WHOLE; partial trust of a
    * broken archive is how loaders read garbage). */
  private[graft] def walkTarHeaders(bytes: Array[Byte])
      : Option[Seq[(String, Long, Long)]] =
    try {
      val rows = scala.collection.mutable.Buffer
        .empty[(String, Long, Long)]
      var off = 0
      var done = false
      while (!done && off + 512 <= bytes.length) {
        if ((0 until 512).forall(i => bytes(off + i) == 0)) done = true
        else {
          // checksum: header summed with bytes 148-155 as spaces
          var ck = 0L
          var i = 0
          while (i < 512) {
            ck += (if (i >= 148 && i < 156) ' '.toInt
              else bytes(off + i) & 0xff)
            i += 1
          }
          def octAt(o: Int, len: Int): Long = {
            var v = 0L; var j = o
            while (j < o + len && bytes(off + j) != 0 &&
                bytes(off + j) != ' ') {
              val c = bytes(off + j) - '0'
              if (c < 0 || c > 7)
                throw new IllegalArgumentException("bad octal")
              v = v * 8 + c; j += 1
            }
            v
          }
          if (octAt(148, 8) != ck)
            throw new IllegalArgumentException("bad checksum")
          val nameEnd = (0 until 100)
            .indexWhere(i => bytes(off + i) == 0) match {
            case -1 => 100
            case n => n
          }
          val name = new String(bytes, off, nameEnd, "US-ASCII")
          val size = octAt(124, 12)
          val dataOff = off + 512L
          if (dataOff + size > bytes.length)
            throw new IllegalArgumentException("truncated member")
          rows += ((name, dataOff, size))
          off += 512 + (((size + 511) / 512) * 512).toInt
        }
      }
      Some(rows.toSeq)
    } catch { case _: Exception => None }

  /** REAL TAR member enumeration — the shard-manifest scan a
    * WebDataset-style corpus needs before any member is touched: walk
    * the 512-byte headers ([[walkTarHeaders]]), emit one row per
    * member with its name, absolute data offset, size, and the exact
    * byte sum of the member data (the cheap content fingerprint;
    * summing forces a real read of the member bytes at their claimed
    * offset). Partition-parallel, no shuffle; malformed/truncated
    * archives screen out, not throw. */
  def tarMembers(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          walkTarHeaders(bytes).iterator.flatMap(_.iterator.map {
            case (name, dataOff, size) =>
              var sum = 0L
              var p = 0
              while (p < size) {
                sum += bytes((dataOff + p).toInt) & 0xff
                p += 1
              }
              (id, name, dataOff, size, sum)
          })
        }
      }
      .toDF("shard_id", "name", "data_off", "size", "byte_sum")
  }

  /** Build a REAL gzip member (RFC 1952): fixed 10-byte header
    * (mtime 0, OS 255), raw-deflate body, CRC32 + ISIZE trailer —
    * readable by any gunzip. Deterministic for a fixed JDK zlib
    * (level pinned), like [[graft.operators.TextAnalysis
    * .compressionRatio]]. */
  private[graft] def buildGzip(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    def le32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    le32(crc.getValue)
    le32(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** REAL gzip decode (RFC 1952) with the integrity contract a
    * corpus loader needs: parse the member header (FEXTRA / FNAME /
    * FCOMMENT / FHCRC fields skipped by their own lengths), inflate
    * the raw-deflate body, and VERIFY the CRC32 and ISIZE trailer —
    * a payload that inflates but fails its checksum is corrupt and
    * screens out, exactly like a bad TAR header. Returns None for
    * anything malformed. */
  private[graft] def decodeGzip(bytes: Array[Byte],
      maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    try {
      if (bytes.length < 18 || (bytes(0) & 0xff) != 0x1f ||
          (bytes(1) & 0xff) != 0x8b || bytes(2) != 8) return None
      val flg = bytes(3) & 0xff
      var off = 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
        off += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(off) != 0) off += 1; off += 1 }
      if ((flg & 16) != 0) { while (bytes(off) != 0) off += 1; off += 1 }
      if ((flg & 2) != 0) off += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, off, bytes.length - off - 8)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw
          new IllegalArgumentException("truncated deflate")
        out.write(buf, 0, n)
        if (out.size() > maxBytes) throw
          new IllegalArgumentException("oversize")
      }
      inf.end()
      val data = out.toByteArray
      def le32(o: Int): Long =
        (0 until 4).map(i => (bytes(o + i) & 0xffL) << (8 * i)).sum
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val tOff = bytes.length - 8
      if (le32(tOff) != crc.getValue ||
          le32(tOff + 4) != (data.length.toLong & 0xffffffffL)) None
      else Some(data)
    } catch { case _: Exception => None }

  /** Deterministic gzip'd text shards: member of id is
    * `id mod 900 + 10` printable bytes, byte p = `(id·11 + p·5) mod
    * 95 + 32` — the decoded stats replay as id algebra while the
    * engine must run the REAL inflate + CRC verification to reach
    * them. */
  def packGzipDocs(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = (id % 900 + 10).toInt
      (id, buildGzip(Array.tabulate(n)(p =>
        ((id * 11 + p.toLong * 5) % 95 + 32).toByte)))
    }.toDF("media_id", "media")
  }

  /** Decoded-member stats through the real gzip decode: per payload,
    * compressed size, decoded size, exact decoded byte sum (the
    * content fingerprint), and the compression ratio in floored ppm.
    * Corrupt members (bad magic, truncated deflate, CRC/ISIZE
    * mismatch) screen out, not throw. */
  def gzipDocStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGzip(bytes).map { data =>
            var sum = 0L
            var i = 0
            while (i < data.length) { sum += data(i) & 0xff; i += 1 }
            (id, bytes.length.toLong, data.length.toLong, sum,
              bytes.length.toLong * 1000000L / math.max(1L, data.length))
          }
        }
      }
      .toDF("media_id", "n_compressed", "n_bytes", "byte_sum",
        "ratio_ppm")
  }

  /** Deterministic WebDataset shards FOR REAL: ustar archives whose
    * members are genuine gzip files — member j of shard id is
    * `doc-<id>-<j>.txt.gz` wrapping `(id·7 + j·13) mod 900 + 10`
    * printable bytes, byte p = `(id·11 + j·17 + p·5) mod 95 + 32`. */
  def packWebShards(spark: SparkSession, df: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val members = (0 until (id % 3 + 2).toInt).map { j =>
        val n = ((id * 7 + j * 13) % 900 + 10).toInt
        (s"doc-$id-$j.txt.gz", buildGzip(Array.tabulate(n)(p =>
          ((id * 11 + j * 17 + p.toLong * 5) % 95 + 32).toByte)))
      }
      (id, buildTar(members))
    }.toDF("media_id", "media")
  }

  /** The WebDataset READ PATH end to end, in ONE partition-parallel
    * pass with no shuffle and no join: per shard, walk the tar
    * headers ([[walkTarHeaders]] — checksums verified), slice each
    * member's bytes at its claimed offset, gunzip it
    * ([[decodeGzip]] — CRC32/ISIZE verified), and emit the decoded
    * doc stats. A corrupt shard screens whole; a corrupt member
    * screens alone (its siblings survive — tar headers are
    * per-member trustworthy once their checksums pass). This is the
    * loader shape a multimodal training job runs over thousands of
    * shards: blobs never leave their partition, and the only state
    * per task is one member's decoded bytes. */
  def shardDocStats(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          walkTarHeaders(bytes).iterator.flatMap(_.iterator.flatMap {
            case (name, dataOff, size) =>
              val member = java.util.Arrays.copyOfRange(
                bytes, dataOff.toInt, (dataOff + size).toInt)
              decodeGzip(member).map { data =>
                var sum = 0L
                var p = 0
                while (p < data.length) { sum += data(p) & 0xff; p += 1 }
                (id, name, data.length.toLong, sum)
              }
          })
        }
      }
      .toDF("shard_id", "name", "n_bytes", "byte_sum")
  }

  /** The WebDataset WRITE path: pack a curated corpus INTO shards —
    * each group of `docsPerShard` documents (by id range, so shard
    * membership is a pure function of the data) becomes one real
    * ustar archive of real gzip members `doc-<id>.txt.gz`. The
    * groupByKey shuffles (id, text) rows once on the shard key and
    * each task materializes ONE shard's members at a time — memory
    * is bounded by docsPerShard × doc size, never the corpus. */
  def writeWebShards(docs: DataFrame, idCol: String, textCol: String,
      docsPerShard: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1 / docsPerShard)
      .mapGroups { (shard, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, t) =>
          (s"doc-$id.txt.gz", buildGzip(t.getBytes("UTF-8")))
        }
        (shard, buildTar(members))
      }
      .toDF("media_id", "media")
  }

  /** Member digests through the full shard read path: per member,
    * decoded size and the md5 hex of the decoded bytes — the
    * strongest possible round-trip check (one byte anywhere in the
    * walk/slice/inflate chain and the digest diverges), and directly
    * comparable to any SQL engine's md5 over the original text. */
  def shardDocDigests(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          walkTarHeaders(bytes).iterator.flatMap(_.iterator.flatMap {
            case (name, dataOff, size) =>
              val member = java.util.Arrays.copyOfRange(
                bytes, dataOff.toInt, (dataOff + size).toInt)
              decodeGzip(member).map { data =>
                val md = java.security.MessageDigest.getInstance("MD5")
                val hex = md.digest(data)
                  .map(b => f"${b & 0xff}%02x").mkString
                (id, name, data.length.toLong, hex)
              }
          })
        }
      }
      .toDF("shard_id", "name", "n_bytes", "digest")
  }

  /** Perceptual average-hash (aHash) through the REAL image decode:
    * sample an 8×8 grid (nearest-neighbor — source pixel
    * (u·w div 8, v·h div 8), integer algebra an oracle replays), and
    * set bit v·8+u iff that sample is above the 64-sample mean —
    * compared as `64·px > Σpx` so no division ever rounds. The hash
    * depends on pixel CONTENT, not container bytes: a PNG and a GIF
    * of the same image collapse to one signature, which is exactly
    * what re-encoded-copy dedup needs. Multi-channel pixels average
    * their channels (integer div). Images smaller than 8×8 screen
    * out with the undecodables. Partition-parallel, no shuffle. */
  def imageAHash(spark: SparkSession, packed: DataFrame): DataFrame = {
    import spark.implicits._
    packed.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).filter(d => d._1 >= 8 && d._2 >= 8).map {
            case (w, h, c, px) =>
              val s = Array.tabulate(64) { b =>
                val x = (b % 8) * w / 8
                val y = (b / 8) * h / 8
                val base = (y * w + x) * c
                var sum = 0; var j = 0
                while (j < c) { sum += px(base + j) & 0xff; j += 1 }
                sum / c
              }
              var tot = 0L; var b = 0
              while (b < 64) { tot += s(b); b += 1 }
              var sig = 0L; b = 0
              while (b < 64) {
                if (64L * s(b) > tot) sig |= 1L << b
                b += 1
              }
              (id, sig)
          }
        }
      }
      .toDF("media_id", "sig")
  }

  /** Cross-format copy corpus for image near-dup detection: content
    * key `k = id mod half`; id < half encodes the image as PNG
    * (rotating filter types), id ≥ half encodes the SAME pixels as a
    * genuinely-LZW-compressed GIF — byte-disjoint containers, equal
    * content. Pixels are a multiplicative hash
    * `((k·1000003 + x·131 + y·31) · 2654435761) mod 251` — chosen
    * over linear/xor rules at design time because those collapse
    * (a linear gradient aliases aHash grids; an xor rule reduces to
    * one content byte per key), where this one yields 239 distinct
    * hashes over 250 contents with bounded LSH buckets. */
  def packImageCopies(spark: SparkSession, df: DataFrame, idCol: String,
      half: Long): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val k = id % half
      val w = (k % 12 + 8).toInt
      val h = ((k * 7) % 12 + 8).toInt
      def pix(x: Int, y: Int): Int =
        (((k * 1000003L + x * 131L + y * 31L) * 2654435761L) % 251).toInt
      if (id < half)
        (id, buildPng(w, h, pix, r => ((k + r) % 5).toInt))
      else (id, buildGif(w, h, pix))
    }.toDF("media_id", "media")
  }

  /** Frame sampling: treat the payload as fixed-size frames and keep
    * every `stride`-th one. Pure column algebra (no decode needed for
    * container formats with fixed frame size). */
  def frameSample(packed: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("media")) / frameBytes).cast("int")
    packed
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        col("media").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }
}
