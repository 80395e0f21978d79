package graft

import graft.operators.{Audio, Multimodal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MEDIA families end to end: audio windowing/VAD/resample/
  * normalization through the real PCM decode, perceptual image
  * hashing through the real image decodes, Hamming-LSH near-dup
  * detection and the persisted fingerprint index lifecycle, the MP4
  * box walk, and the TAR/gzip/WebDataset container chain — every
  * operator exercised on planted corpora with in-process replays of
  * the synthesis rules. */
class MediaSpec extends SparkSpec {

  import spark.implicits._

  private def idsDF(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("audioWindows: window count and sizes match the pack contract") {
    val rows = Audio.audioWindows(spark,
        Audio.packVadWavs(spark, idsDF(24), "doc_id"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("wins"), min("n").as("mn"), max("n").as("mx"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == 24)
    rows.foreach { case (id, (wins, mn, mx)) =>
      assert(wins == id % 24 + 8, s"id=$id")
      assert(mn == Audio.WinSize && mx == Audio.WinSize)
    }
  }

  test("energy gate recovers the synthesis voiced rule exactly") {
    val gated = Audio.audioWindows(spark,
        Audio.packVadWavs(spark, idsDF(40), "doc_id"))
      .select(col("media_id"), col("win"),
        (col("sum_abs") >= col("n") * Audio.MeanAbsGate).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    gated.foreach { case ((id, w), v) =>
      assert(v == ((id * 31 + w * w * 13) % 7 < 4), s"id=$id w=$w")
    }
  }

  test("vadSegments: islands, longest run, and the all-silent payload") {
    // media 1: V V S V V V  -> 2 segments, longest 3, 5 voiced
    // media 2: S S          -> zero row via the outer-join path
    val loud = 5000L * 16; val quiet = 100L * 16
    val win = Seq(
      (1L, 0L, 16L, loud), (1L, 1L, 16L, loud), (1L, 2L, 16L, quiet),
      (1L, 3L, 16L, loud), (1L, 4L, 16L, loud), (1L, 5L, 16L, loud),
      (2L, 0L, 16L, quiet), (2L, 1L, 16L, quiet))
      .toDF("media_id", "win", "n", "sum_abs")
      .withColumn("sum_sq", lit(0L)).withColumn("peak", lit(0L))
    val out = Audio.vadSegments(win).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((6L, 5L, 2L, 3L, 833333L)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 0L)))
  }

  test("fingerprints: bit w set exactly for voiced windows") {
    val loud = 5000L * 16; val quiet = 100L * 16
    val win = Seq((7L, 0L, 16L, loud), (7L, 1L, 16L, quiet),
        (7L, 2L, 16L, loud), (7L, 3L, 16L, loud))
      .toDF("media_id", "win", "n", "sum_abs")
      .withColumn("sum_sq", lit(0L)).withColumn("peak", lit(0L))
    val sig = Audio.fingerprints(win).collect().head.getLong(1)
    assert(sig == ((1L << 0) | (1L << 2) | (1L << 3)))
  }

  test("near-dup recovers exactly the planted copies at Hamming 1") {
    val half = 20L
    val sigs = Audio.fingerprints(Audio.audioWindows(spark,
      Audio.packAudioCopies(spark, idsDF(40), "doc_id", half)))
    val pairs = Audio.nearDupPairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // expected: the synthesis rule replayed in-process
    def sig(k: Long, flip: Boolean): Long =
      (0 until 32).foldLeft(0L) { (s, w) =>
        val v = (((k * 2654435761L) ^ (w * 40503L)) % 97 < 58) ^
          (flip && w == (k % 32))
        if (v) s | (1L << w) else s
      }
    val expected = (0L until half).flatMap { k =>
      val h = java.lang.Long.bitCount(sig(k, false) ^ sig(k, true))
      if (h <= 2) Some((k, k + half, h.toLong)) else None
    }
    // plus any incidental close pairs the rule happens to produce
    val all = (0L until 40L).map(id =>
      id -> sig(id % half, id >= half)).toMap
    val incidental = for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      if b != a + half || a >= half
      h = java.lang.Long.bitCount(all(a) ^ all(b))
      if h <= 2
    } yield (a, b, h.toLong)
    assert(pairs.toSeq == (expected ++ incidental).sorted)
    assert(expected.size == half && expected.forall(_._3 == 1L))
  }

  test("resample: identity at equal rates, exact 2:1 decimation") {
    val s = Array.tabulate(40)(i => ((i * 1234 + 7) % 65536 - 32768).toShort)
    def packAt(rate: Int) = Seq((1L, Multimodal.buildWav(rate, s)))
      .toDF("media_id", "media")
    def samplesOf(df: org.apache.spark.sql.DataFrame): Array[Short] =
      Multimodal.decodeWavSamples(
        df.collect().head.getAs[Array[Byte]]("media")).get._3
    // same rate: i0 = j, frac = 0 -> byte-exact passthrough
    assert(samplesOf(Audio.resamplePcm(spark, packAt(16000), 16000))
      .sameElements(s))
    // 2:1: output j reads input 2j exactly (frac = 0 throughout)
    val down = samplesOf(Audio.resamplePcm(spark, packAt(32000), 16000))
    assert(down.length == 20)
    assert(down.sameElements(Array.tabulate(20)(j => s(2 * j))))
  }

  test("curate: every class lands in its funnel stage, min-id survives") {
    // ids 0..35 -> 6 per class
    val (survivors, funnel) = graft.operators.Audio.curate(spark,
      Audio.packCurateWavs(spark, idsDF(36), "doc_id"))
    val f = funnel.collect().head
    assert((f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3),
      f.getLong(4)) == ((36L, 30L, 24L, 18L, 12L)))
    val surv = survivors.collect().map(_.getLong(0)).toSet
    // classes 3 and 5 survive; class 4 (the copies) collapse onto 3
    val expected = (0L until 36L)
      .filter(id => id % 6 == 3 || id % 6 == 5).toSet
    assert(surv == expected)
  }

  test("imageAHash: PNG and GIF of the same pixels share a signature") {
    val packed = Multimodal.packImageCopies(spark, idsDF(20), "doc_id", 10L)
    val sigs = Multimodal.imageAHash(spark, packed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 20)
    (0L until 10L).foreach { k =>
      assert(sigs(k) == sigs(k + 10), s"content $k diverged across formats")
    }
    // the hash is content-derived, not container-derived: distinct
    // contents should (for this corpus) not all collide
    assert(sigs.values.toSet.size > 1)
    // replay one signature from the synthesis rule
    val k = 3L
    val w = (k % 12 + 8).toInt; val h = ((k * 7) % 12 + 8).toInt
    val s = Array.tabulate(64) { b =>
      val x = (b % 8) * w / 8; val y = (b / 8) * h / 8
      (((k * 1000003L + x * 131L + y * 31L) * 2654435761L) % 251).toInt
    }
    val tot = s.map(_.toLong).sum
    val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
      if (64L * s(b) > tot) acc | (1L << b) else acc
    }
    assert(sigs(k) == expected)
  }

  test("imageAHash: BMP joins the cross-format collapse") {
    def pix(x: Int, y: Int): Int =
      (((7L * 1000003L + x * 131L + y * 31L) * 2654435761L) % 251).toInt
    val payloads = Seq(
      (1L, Multimodal.buildPng(11, 9, pix, _ => 2)),
      (2L, Multimodal.buildGif(11, 9, pix)),
      (3L, Multimodal.buildBmp(11, 9, pix)))
      .toDF("media_id", "media")
    val sigs = Multimodal.imageAHash(spark, payloads).collect()
      .map(_.getLong(1)).toSet
    assert(sigs.size == 1,
      "PNG/GIF/BMP of identical pixels must share one signature")
  }

  test("hamming index lifecycle: build, probe, append, grown == rebuilt") {
    import graft.operators.Dedup
    def sigsOf(ids: Seq[Long], half: Long) =
      Multimodal.imageAHash(spark, Multimodal.packImageCopies(spark,
        ids.toDF("doc_id"), "doc_id", half))
    // corpus: 20 PNGs of contents 0..19; batch1: GIFs of the same
    // contents at ids 100..119; batch2 probes at ids 200..219
    val corpus = sigsOf(0L until 20L, 100L)
    val batch1 = sigsOf(100L until 120L, 100L)
    val batch2 = sigsOf(200L until 220L, 200L)
    val dirA = java.nio.file.Files.createTempDirectory("graft_hidx_a").toString
    Dedup.buildHammingIndex(corpus, dirA)
    // expected pairs replayed from the collected signatures
    def expectedPairs(batch: DataFrame, indexed: DataFrame): Set[(Long, Long, Long)] = {
      val ix = indexed.collect().map(r => r.getLong(0) -> r.getLong(1))
      val bs = batch.collect().map(r => r.getLong(0) -> r.getLong(1))
      (for {
        (bi, bsig) <- bs; (ci, csig) <- ix
        if (0 until 8).exists(bd =>
          ((bsig >> (bd * 8)) & 255) == ((csig >> (bd * 8)) & 255))
        h = java.lang.Long.bitCount(bsig ^ csig)
        if h <= 2
      } yield (bi, ci, h.toLong)).toSet
    }
    val probe1 = Dedup.probeHammingIndex(spark, dirA, batch1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe1 == expectedPairs(batch1, corpus))
    assert((0L until 20L).forall(k => probe1.contains((100L + k, k, 0L))),
      "every cross-container copy must be found at distance 0")
    // grow, then probe batch2 against corpus + batch1
    val (appended, dropped) = Dedup.appendToHammingIndex(spark, dirA, batch1)
    assert(appended == 20L && dropped == 0L)
    val probe2 = Dedup.probeHammingIndex(spark, dirA, batch2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe2 == expectedPairs(batch2, corpus.unionByName(batch1)))
    assert((0L until 20L).forall(k => probe2.contains((200L + k, k, 0L)) &&
      probe2.contains((200L + k, 100L + k, 0L))),
      "the grown index must match both generations")
    // grown == one-shot rebuild over the concatenated corpus
    val dirB = java.nio.file.Files.createTempDirectory("graft_hidx_b").toString
    Dedup.buildHammingIndex(corpus.unionByName(batch1), dirB)
    val probe2b = Dedup.probeHammingIndex(spark, dirB, batch2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe2b == probe2)
    // takedown: remove the appended generation from dirA — probes
    // stop matching it, the original corpus still matches
    Dedup.deleteFromHammingIndex(spark, dirA,
      (100L until 120L).toDF("doc_id"), "doc_id")
    val probe3 = Dedup.probeHammingIndex(spark, dirA, batch2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe3 == expectedPairs(batch2, corpus))
  }

  test("hamming intake: first-wins batches, MIS survivors, idempotent re-delivery") {
    import graft.operators.Dedup
    // half = 19 (odd) so each planted copy lands in the OTHER parity
    // batch — the cross-batch first-wins path is actually exercised;
    // contents 0..18 verified incidental-free at design time
    val half = 19L
    val sigs = Multimodal.imageAHash(spark, Multimodal.packImageCopies(
      spark, (0L until 38L).toDF("doc_id"), "doc_id", half))
    val dir = java.nio.file.Files.createTempDirectory("graft_hintake")
      .toString
    val bySig = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var admitted = Set.empty[Long]
    var dropped = 0L
    (0 until 2).foreach { b =>
      val slice = sigs.where(pmod(col("media_id"), lit(2L)) === b)
      val (surv, dIdx, dBatch) = Dedup.hammingIntakeStep(spark, slice, dir)
      admitted ++= surv.collect().map(_.getLong(0))
      dropped += dIdx + dBatch
    }
    assert(admitted.size + dropped == 38L)
    for (a <- admitted; c <- admitted if a < c)
      assert(java.lang.Long.bitCount(bySig(a) ^ bySig(c)) > 2,
        s"survivors $a and $c are near-dups")
    (0L until half).foreach { k =>
      assert(admitted(k) ^ admitted(k + half),
        s"pair ($k, ${k + half}) must keep exactly one endpoint")
    }
    // re-delivering everything admits nothing and appends nothing
    val (again, dIdx2, dBatch2) = Dedup.hammingIntakeStep(spark, sigs, dir)
    assert(again.count() == 0L && dIdx2 == 38L && dBatch2 == 0L)
  }

  test("mp4Info: real box walk — order-independent, truncation screens") {
    // reorder boxes (moov before ftyp): a parser on fixed offsets breaks
    val normal = Multimodal.buildMp4("isom", 5, 3000L, 4567L, 2)
    def be32At(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    // split the built payload back into top-level boxes and reverse
    val boxes = Iterator.unfold(0) { off =>
      if (off >= normal.length) None
      else { val s = be32At(normal, off)
        Some((normal.slice(off, off + s), off + s)) }
    }.toSeq
    val reordered = boxes.reverse.flatten.toArray
    val df = Seq((1L, normal), (2L, reordered),
        (3L, normal.take(20)), // truncated mid-box
        (4L, "nonsense".getBytes("US-ASCII")))
      .toDF("media_id", "media")
    val out = Multimodal.mp4Info(spark, df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set(1L, 2L), "malformed payloads must screen out")
    assert(out(1L) == (("isom", 3000L, 4567L, 4567L * 1000 / 3000, 2L)))
    assert(out(2L) == out(1L), "box order must not matter")
  }

  test("normalizePeak: peak lands on target, signs preserved, zero passthrough") {
    val s = Array[Short](-20000, 10000, 0, 5000, -2500)
    val packed = Seq(
      (1L, Multimodal.buildWav(16000, s)),
      (2L, Multimodal.buildWav(16000, Array[Short](0, 0, 0))))
      .toDF("media_id", "media")
    val out = graft.operators.Audio.normalizePeak(spark, packed, 30000)
      .collect().map(r => r.getLong(0) ->
        Multimodal.decodeWavSamples(r.getAs[Array[Byte]]("media")).get._3)
      .toMap
    val expected = s.map { v =>
      val sc = math.abs(v.toLong) * 30000 / 20000
      (if (v < 0) -sc else sc).toShort
    }
    assert(out(1L).sameElements(expected))
    assert(out(1L).map(v => math.abs(v.toInt)).max == 30000)
    assert(out(2L).sameElements(Array[Short](0, 0, 0)))
  }

  test("hamming intake: an empty first batch creates no index; the next one does") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft_hintake0")
      .toString
    val empty = Seq.empty[(Long, Long)].toDF("media_id", "sig")
    val (s0, d0a, d0b) = Dedup.hammingIntakeStep(spark, empty, dir)
    assert(s0.count() == 0L && d0a == 0L && d0b == 0L)
    assert(!new java.io.File(s"$dir/meta").exists())
    val sigs = Multimodal.imageAHash(spark, Multimodal.packImageCopies(
      spark, idsDF(4), "doc_id", 4L))
    val (s1, _, _) = Dedup.hammingIntakeStep(spark, sigs, dir)
    assert(s1.count() == 4L)
    assert(new java.io.File(s"$dir/meta").exists())
  }

  test("tar shards: round-trip, checksum tamper screens, system-tar interop") {
    val members = Seq(
      ("a.txt", Array.tabulate(10)(_.toByte)),
      ("dir-b.bin", Array.tabulate(700)(i => (i % 251).toByte)))
    val tar = Multimodal.buildTar(members)
    val rows = Multimodal.tarMembers(spark,
        Seq((1L, tar)).toDF("media_id", "media"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("a.txt", 512L, 10L, (0 until 10).sum.toLong),
      ("dir-b.bin", 1536L, 700L,
        (0 until 700).map(_ % 251).sum.toLong)))
    // one flipped header byte -> checksum mismatch -> shard screens
    val bad = tar.clone(); bad(0) = 'z'.toByte
    assert(Multimodal.tarMembers(spark,
      Seq((2L, bad)).toDF("media_id", "media")).count() == 0L)
    // interop: the system tar must list the same member names
    val f = java.nio.file.Files.createTempFile("graft_tar", ".tar")
    java.nio.file.Files.write(f, tar)
    try {
      val p = new ProcessBuilder("tar", "-tf", f.toString).start()
      val out = new String(p.getInputStream.readAllBytes, "US-ASCII")
      if (p.waitFor() == 0)
        assert(out.trim.linesIterator.toSeq.sorted ==
          Seq("a.txt", "dir-b.bin"),
          s"system tar disagrees:\n$out")
      // a missing tar binary skips interop, never fails the build
    } catch { case _: java.io.IOException => () }
    finally java.nio.file.Files.delete(f)
  }

  test("gzip: round-trip, gunzip interop, CRC tamper screens, FNAME skip") {
    val data = Array.tabulate(500)(i => ((i * 7) % 95 + 32).toByte)
    val gz = Multimodal.buildGzip(data)
    assert(Multimodal.decodeGzip(gz).exists(_.sameElements(data)))
    // a flipped payload byte must fail the CRC, not return wrong data
    val bad = gz.clone(); bad(15) = (bad(15) ^ 0x01).toByte
    assert(Multimodal.decodeGzip(bad).isEmpty)
    // truncation screens
    assert(Multimodal.decodeGzip(gz.take(gz.length - 4)).isEmpty)
    // a header with FNAME set (as real gzip tools write) still decodes
    val named = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0,
        0xff.toByte))
      out.write("member.txt".getBytes("US-ASCII")); out.write(0)
      out.write(gz, 10, gz.length - 10)
      out.toByteArray
    }
    assert(Multimodal.decodeGzip(named).exists(_.sameElements(data)))
    // interop: system gunzip must recover the same bytes
    val f = java.nio.file.Files.createTempFile("graft_gz", ".gz")
    java.nio.file.Files.write(f, gz)
    try {
      val p = new ProcessBuilder("gzip", "-dc", f.toString).start()
      val out = p.getInputStream.readAllBytes
      if (p.waitFor() == 0)
        assert(out.sameElements(data), "system gunzip disagrees")
    } catch { case _: java.io.IOException => () }
    finally java.nio.file.Files.delete(f)
  }

  test("shard pipeline: a corrupt member screens alone, siblings survive") {
    val good = Multimodal.buildGzip(Array.tabulate(50)(_.toByte))
    val bad = good.clone(); bad(12) = (bad(12) ^ 0x7f).toByte
    val tar = Multimodal.buildTar(Seq(
      ("ok-a.gz", good), ("broken.gz", bad), ("ok-b.gz", good)))
    val out = Multimodal.shardDocStats(spark,
        Seq((9L, tar)).toDF("media_id", "media"))
      .collect().map(_.getString(1)).sorted
    assert(out.toSeq == Seq("ok-a.gz", "ok-b.gz"))
  }

  test("undecodable payloads are screened out, not thrown") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)),
        (2L, "RIFFxxxxWAVE".getBytes("US-ASCII")))
      .toDF("media_id", "media")
    assert(Audio.audioWindows(spark, junk).count() == 0)
    // and a real payload among junk still decodes
    val mixed = junk.unionByName(
      Audio.packVadWavs(spark, Seq(5L).toDF("doc_id"), "doc_id"))
    assert(Audio.audioWindows(spark, mixed)
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(5L))
  }

  test("jpeg SOF walk: hand-built marker streams — SOF0/SOF2, fill bytes, " +
      "RST, and every corruption class reads null, never throws") {
    import graft.functions.JpegSofDims
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def pack(h: Int, w: Int): Long = (h.toLong << 16) | w.toLong
    val app0 = "FFE000104A46494600010100000100010000"
    val sof0 = "FFC0000B08" + "0100" + "0200" + "01011100" // h=256 w=512
    // plain SOI + APP0 + SOF0
    assert(JpegSofDims.dims(bytes("FFD8" + app0 + sof0)) === pack(256, 512))
    // progressive SOF2 parses the same header shape
    assert(JpegSofDims.dims(bytes("FFD8" + app0 +
      "FFC2000B080080004001011100")) === pack(128, 64))
    // legal FF fill bytes before a marker
    assert(JpegSofDims.dims(bytes("FFD8FFFFFF" + sof0.drop(2))) ===
      pack(256, 512))
    // a standalone RST/TEM marker (no length) is hopped, not mis-sized
    assert(JpegSofDims.dims(bytes("FFD8FFD0FF01" + sof0)) === pack(256, 512))
    // DHT (C4) is NOT a frame header — its bytes must not read as dims
    assert(JpegSofDims.dims(bytes("FFD8FFC4000401FF" + sof0)) ===
      pack(256, 512))
    // corruption classes: all null, none throw
    assert(JpegSofDims.dims(bytes("FFD8")) === null) // nothing after SOI
    assert(JpegSofDims.dims(bytes("89504E47")) === null) // not a JPEG
    assert(JpegSofDims.dims(bytes("FFD8FFDA0004FFC0")) === null) // SOS first
    assert(JpegSofDims.dims(bytes("FFD8FFD9")) === null) // EOI first
    assert(JpegSofDims.dims(bytes("FFD8FFE000")) === null) // truncated len
    assert(JpegSofDims.dims(bytes("FFD8FFE00001")) === null) // len < 2
    assert(JpegSofDims.dims(bytes("FFD8FFC00004")) === null) // SOF truncated
    assert(JpegSofDims.dims(bytes("FFD800")) === null) // not at a marker
    assert(JpegSofDims.dims(Array.empty[Byte]) === null)
    // the Column surface: imageDims dispatches jpeg through the walk
    // and the synthesizer round-trips at every COM alignment
    val packed = Multimodal.packFakeJpegs(
      (0 until 60).map(i => Tuple1(i.toLong)).toDF("doc_id"), "doc_id")
    val got = packed.select(col("media_id"),
        Multimodal.imageDims(col("media")).getField("width").as("w"),
        Multimodal.imageDims(col("media")).getField("height").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, w, h) =>
      assert(w === id % 3000 + 16, s"width of $id")
      assert(h === (id * 7) % 2000 + 16, s"height of $id")
    }
  }

  test("EXIF orientation walk: both TIFF byte orders, tag position, XMP " +
      "hop, and every corruption class reads null, never throws") {
    import graft.functions.ExifOrientation.{orientation => ori}
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // minimal II TIFF: header + 1-entry IFD0 (orientation=6)
    val tiffII1 = "49492A0008000000" + "0100" +
      "1201" + "0300" + "01000000" + "06000000" + "00000000"
    val app1II1 = "FFE1" + "0022" + "457869660000" + tiffII1
    assert(ori(bytes("FFD8" + app1II1)) === 6)
    // MM variant, same value
    val tiffMM1 = "4D4D002A00000008" + "0001" +
      "0112" + "0003" + "00000001" + "00060000" + "00000000"
    assert(ori(bytes("FFD8" + "FFE1" + "0022" + "457869660000" + tiffMM1))
      === 6)
    // a non-Exif APP1 (XMP) before the Exif one is hopped, not misread
    val xmp = "FFE1" + "000A" + "68747470AABBCCDD"
    assert(ori(bytes("FFD8" + xmp + app1II1)) === 6)
    // APP0 + COM before APP1: the segment walk reaches it
    val app0 = "FFE000104A46494600010100000100010000"
    assert(ori(bytes("FFD8" + app0 + "FFFE000441" + "41" + app1II1)) === 6)
    // corruption classes: all null, none throw
    assert(ori(bytes("FFD8" + app0)) === null)          // no APP1 at all
    assert(ori(bytes("89504E47")) === null)             // not a JPEG
    assert(ori(bytes("FFD8" + "FFE1" + "0008" + "457869660000")) === null) // no TIFF
    assert(ori(bytes("FFD8" + "FFE1" + "0022" + "457869660000" +
      "5A5A2A0008000000" + tiffII1.drop(16))) === null) // bad byte order
    assert(ori(bytes("FFD8" + "FFE1" + "0022" + "457869660000" +
      "4949FF00" + tiffII1.drop(8))) === null)          // bad magic
    // orientation out of range (9) reads null
    val tiffBad = "49492A0008000000" + "0100" +
      "1201" + "0300" + "01000000" + "09000000" + "00000000"
    assert(ori(bytes("FFD8" + "FFE1" + "0022" + "457869660000" + tiffBad))
      === null)
    // hostile IFD offset pointing past the segment reads null
    val tiffOff = "49492A00FFFFFF7F" + "0100" +
      "1201" + "0300" + "01000000" + "06000000" + "00000000"
    assert(ori(bytes("FFD8" + "FFE1" + "0022" + "457869660000" + tiffOff))
      === null)
    assert(ori(Array.empty[Byte]) === null)
    // the Column surface + synthesizer round-trip: every COM alignment,
    // both byte orders, the tag NOT first in a 3-entry IFD
    val packed = Multimodal.packFakeExifJpegs(
      (0 until 60).map(i => Tuple1(i.toLong)).toDF("doc_id"), "doc_id")
    val got = packed.select(col("media_id"),
        Multimodal.exifOrientation(col("media")).as("o"),
        Multimodal.imageDims(col("media")).getField("width").as("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (id, o, w) =>
      assert(o === id % 8 + 1, s"orientation of $id")
      assert(w === id % 3000 + 16, s"width of $id through the same walk")
    }
    // SQL surface
    graft.functions.GraftFunctions.ensureRegistered(spark)
    packed.limit(8).createOrReplaceTempView("exif_probe")
    val viaSql = spark.sql(
      "SELECT media_id, exif_orientation(media) AS o FROM exif_probe")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    viaSql.foreach { case (id, o) => assert(o === id % 8 + 1) }
  }

  test("jpeg decode: block-constant fixtures round-trip BYTE-EXACTLY " +
      "(DC-only blocks), with and without restart markers") {
    for (id <- 0L until 12L) {
      val w = 8 * (id % 4 + 1).toInt
      val h = 8 * ((id * 5) % 3 + 1).toInt
      def bv(bx: Int, by: Int) = ((id * 37 + bx * 11 + by * 19) % 256).toInt
      for (rst <- Seq(0, 2)) {
        val bytes = Multimodal.buildJpegGrayBlocks(w, h, bv, rst)
        val Some((dw, dh, bpp, px)) = Multimodal.decodeJpeg(bytes)
        assert((dw, dh, bpp) === ((w, h, 1)), s"id=$id rst=$rst")
        for (y <- 0 until h; x <- 0 until w)
          assert((px(y * w + x) & 0xff) === bv(x / 8, y / 8),
            s"id=$id rst=$rst pixel ($x,$y)")
      }
    }
  }

  test("jpeg full FDCT round-trip: smooth gray content reconstructs " +
      "within the quantizer's error bound; AC entropy paths are " +
      "genuinely exercised") {
    val w = 37; val h = 23 // NOT 8-multiples: crop + edge-pad paths
    val pix = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (90 + x * 2 + y * 3 +
        (8 * StrictMath.sin(x / 5.0) * StrictMath.cos(y / 4.0)).toInt).toByte
    }
    val bytes = Multimodal.encodeJpeg(w, h, 1, pix, Array.fill(64)(1))
    // the stream must contain genuine AC coefficients, not only DC
    // (a DC-only encode of this content would be a broken FDCT)
    val Some((dw, dh, bpp, out)) = Multimodal.decodeJpeg(bytes)
    assert((dw, dh, bpp) === ((w, h, 1)))
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs((out(i) & 0xff) - (pix(i) & 0xff)))
    assert(maxErr <= 2, s"q=1 gray round-trip err $maxErr")
    // coarser quantizer: error bounded by ~the quant step, not exact
    val q8 = Multimodal.encodeJpeg(w, h, 1, pix, Array.fill(64)(8))
    val Some((_, _, _, out8)) = Multimodal.decodeJpeg(q8)
    var maxErr8 = 0
    for (i <- 0 until w * h)
      maxErr8 = math.max(maxErr8, math.abs((out8(i) & 0xff) - (pix(i) & 0xff)))
    assert(maxErr8 <= 24 && q8.length < bytes.length,
      s"q=8 err $maxErr8, sizes ${q8.length}/${bytes.length}")
  }

  test("jpeg color: 4:4:4 and 4:2:0 round-trips within the color-" +
      "convert bound; the chroma upsample path serves 4:2:0") {
    val w = 20; val h = 18
    val rgb = Array.tabulate(w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val x = i % w; val y = i / w
      (60 + c * 40 + x * 3 + y * 2).toByte
    }
    for (samp <- Seq((1, 1), (2, 2), (2, 1))) {
      val bytes = Multimodal.encodeJpeg(w, h, 3, rgb, Array.fill(64)(1), samp)
      val Some((dw, dh, bpp, out)) = Multimodal.decodeJpeg(bytes)
      assert((dw, dh, bpp) === ((w, h, 3)), s"sampling $samp")
      var maxErr = 0
      for (i <- 0 until w * h * 3)
        maxErr = math.max(maxErr,
          math.abs((out(i) & 0xff) - (rgb(i) & 0xff)))
      // 4:4:4 pays only the YCbCr round-trip; subsampled chroma pays
      // the box-downsample + nearest-upsample on a smooth gradient
      val bound = if (samp == ((1, 1))) 4 else 16
      assert(maxErr <= bound, s"sampling $samp err $maxErr")
    }
  }

  test("jpeg conformance vectors: a lone horizontal AC coefficient " +
      "varies columns only, a vertical one rows only, and the IDCT " +
      "matches an independently computed basis") {
    def mk(naturalIdx: Int, value: Int): Array[Byte] = {
      val coefs = new Array[Int](64)
      coefs(0) = 0; coefs(naturalIdx) = value
      Multimodal.assembleJpeg(8, 8, Array.fill(64)(1),
        Array(1), Array(1), Array(Array(coefs)), 0)
    }
    // natural index 1 = (u=1, v=0): horizontal cosine — rows identical
    val Some((_, _, _, hpx)) = Multimodal.decodeJpeg(mk(1, 40))
    for (y <- 1 until 8; x <- 0 until 8)
      assert(hpx(y * 8 + x) === hpx(x), "rows must be identical")
    assert((0 until 8).map(x => hpx(x) & 0xff).distinct.length > 1,
      "columns must vary")
    // natural index 8 = (u=0, v=1): vertical cosine — columns identical
    val Some((_, _, _, vpx)) = Multimodal.decodeJpeg(mk(8, 40))
    for (y <- 0 until 8; x <- 1 until 8)
      assert(vpx(y * 8 + x) === vpx(y * 8), "columns must be identical")
    // independent IDCT replay (Math.cos here vs StrictMath inside)
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = math.round(
        0.25 * c(1) * c(0) * 40.0 *
          math.cos((2 * x + 1) * 1 * math.Pi / 16)).toInt + 128
      assert(math.abs((hpx(y * 8 + x) & 0xff) - expect) <= 1,
        s"independent IDCT at ($x,$y)")
    }
  }

  test("jpeg screens: truncated, progressive and garbage payloads " +
      "read None; decodeImage dispatches JPEG magic") {
    val good = Multimodal.buildJpegGrayBlocks(16, 16, (_, _) => 99)
    assert(Multimodal.decodeJpeg(good).isDefined)
    assert(Multimodal.decodeJpeg(good.take(good.length / 2)).isEmpty,
      "truncated must screen")
    // flip SOF0 to SOF2 (progressive) — must screen, not mis-decode
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Multimodal.decodeJpeg(prog).isEmpty, "progressive must screen")
    assert(Multimodal.decodeJpeg(Array.fill[Byte](64)(0x33)).isEmpty)
    val via = Multimodal.decodeImage(good)
    assert(via.exists(d => d._1 == 16 && d._2 == 16 && d._3 == 1),
      "decodeImage must route JPEG")
  }

  test("jpeg through the unified pipeline: resizeImage transcodes " +
      "JPEG->PNG with exact nearest-neighbor pixels on block-constant " +
      "content") {
    import spark.implicits._
    val src = Seq((5L,
      Multimodal.buildJpegGrayBlocks(24, 16,
        (bx, by) => (40 + bx * 30 + by * 50) % 256)))
      .toDF("media_id", "media")
    val out = Multimodal.resizeImage(spark, src, 12, 8)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(out.length === 1)
    val Some((w, h, bpp, px)) = Multimodal.decodePng(out.head._2)
    assert((w, h, bpp) === ((12, 8, 1)))
    // nearest-neighbor: out(x,y) = src(x*24/12, y*16/8) — the source
    // pixel's block value, replayable exactly
    for (y <- 0 until 8; x <- 0 until 12) {
      val sx = x * 24 / 12; val sy = y * 16 / 8
      val expect = (40 + (sx / 8) * 30 + (sy / 8) * 50) % 256
      assert((px(y * 12 + x) & 0xff) === expect, s"pixel ($x,$y)")
    }
  }

  test("mp3 frame walk: genuine MPEG-1 Layer III framings replay their " +
      "geometry exactly; ID3v2/ID3v1 skip; corruption classes screen") {
    val stats = Audio.mp3Stats(spark,
        Audio.packRealMp3s(spark, idsDF(30), "doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stats.size === 30, "every framing must walk cleanly")
    val rates = Array(44100L, 48000L, 32000L)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    for (id <- 0L until 30L) {
      val frames = id % 9 + 2
      val sr = rates((id % 3).toInt)
      val s = (0L until frames).map(f => kbps(((id * 7 + f) % 14 + 1).toInt))
        .sum
      assert(stats(id) === ((sr, frames, frames * 1152L * 1000L / sr,
        s / frames)), s"id=$id")
    }
    // corruption classes screen, never throw
    val good = Audio.packRealMp3s(spark, idsDF(2), "doc_id")
      .where(col("media_id") === 1L)
      .collect()(0).getAs[Array[Byte]]("media")
    assert(Audio.mp3Info(good).isDefined)
    assert(Audio.mp3Info(good.dropRight(7)).isEmpty, "torn tail screens")
    val layer2 = good.clone()
    layer2(1) = 0xfd.toByte // layer II
    assert(Audio.mp3Info(layer2).isEmpty, "layer II screens")
    val mpeg2 = good.clone()
    mpeg2(1) = 0xf3.toByte // MPEG-2
    assert(Audio.mp3Info(mpeg2).isEmpty, "MPEG-2 screens")
    assert(Audio.mp3Info(Array.fill[Byte](64)(0x11)).isEmpty)
    assert(Audio.mp3Info(Array.emptyByteArray).isEmpty)
  }

  test("jpeg cross-format: the SAME block-constant content as PNG and " +
      "JPEG produces the SAME aHash signature (distance-0 near-dup)") {
    val packed = Multimodal.packJpegPngCopies(spark, idsDF(40), "doc_id", 20L)
    val sigs = Multimodal.imageAHash(spark, packed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs.size === 40, "every payload must decode")
    for (k <- 0L until 20L)
      assert(sigs(k) === sigs(k + 20L),
        s"PNG/JPEG pair $k must collapse to one signature")
  }
}
