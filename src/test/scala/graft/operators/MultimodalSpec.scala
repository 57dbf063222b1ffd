package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(0L, "image", Array.tabulate[Byte](256)(_.toByte), Row(16, 16, null, null)),
      Row(1L, "audio", Array.fill[Byte](1000)(65), Row(null, null, 44100, null)),
      Row(2L, "video", Array.tabulate[Byte](4096)(i => (i % 251).toByte), Row(64, 64, null, 100)),
      Row(3L, "image", null, Row(null, null, null, null)),
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), Multimodal.schema)
  }

  test("schema carries binary payload + typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.where(col("meta.sample_rate") === 44100).count() == 1)
  }

  test("stub decode: 16-bin byte histogram, total == payload length") {
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Seq[Double]]("features"))).toMap
    assert(f(0L).get.sum == 256.0)
    assert(f(0L).get.forall(_ == 16.0)) // uniform byte values -> uniform histogram
    assert(f(1L).get(4) == 1000.0)      // 'A' = 0x41 -> bin 4
    assert(f(3L).isEmpty)               // null payload -> null features
  }

  test("REAL resize: NN 4x4 -> 2x2 samples exactly pixels (0,0),(2,0),(0,2),(2,2)") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (p <- 0 until 16) // pixel p: r = 10p, g = 10p+1, b = 10p+2
      img.setRGB(p % 4, p / 4, ((10 * p) << 16) | ((10 * p + 1) << 8) | (10 * p + 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeImage(bos.toByteArray, 2, 2).get
    // sampled src pixels p = 0, 2, 8, 10 → sumR = 10·(0+2+8+10) = 200
    assert(out == Multimodal.ImageFeatures(2, 2, 200L, 204L, 208L))
    assert(Multimodal.resizeImage(null, 2, 2).isEmpty)
    assert(Multimodal.resizeImage(Array[Byte](1, 2, 3), 2, 2).isEmpty)
  }

  test("REAL image decode: known 2x2 PNG round-trips to exact pixel sums") {
    // encode known pixels with ImageIO, decode with decodeImage — channel
    // sums must be bit-exact: (10,20,30),(40,50,60),(70,80,90),(100,110,120)
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (40 << 16) | (50 << 8) | 60)
    img.setRGB(0, 1, (70 << 16) | (80 << 8) | 90)
    img.setRGB(1, 1, (100 << 16) | (110 << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Multimodal.decodeImage(bos.toByteArray).get
    assert(got == Multimodal.ImageFeatures(2, 2, 220L, 260L, 300L))
  }

  test("syntheticPng decodes back to the generator formula's sums") {
    val id = 42L
    val got = Multimodal.decodeImage(Multimodal.syntheticPng(id, 16, 16)).get
    def s(c: Int) = (0 until 256).map(p => (id * 7919 + p * 257 + c * 101) % 256).sum
    assert(got == Multimodal.ImageFeatures(16, 16, s(0), s(1), s(2)))
  }

  test("REAL WAV decode: header fields + exact sample aggregates") {
    val id = 7L
    val wav = Multimodal.syntheticWav(id, 480, 8000)
    val got = Multimodal.decodeWav(wav).get
    val samples = (0 until 480).map(i => (((id * 131 + i * 17) % 65536) - 32768).toInt)
    assert(got == Multimodal.WavFeatures(8000, 1, 480, samples.map(_.toLong).sum, samples.max))
  }

  test("corrupt/undecodable payloads degrade to None, never throw") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](100)(0)).isEmpty)
    // truncated WAV: valid header, data chunk claims more bytes than exist
    val wav = Multimodal.syntheticWav(1L, 480, 8000).take(200)
    assert(Multimodal.decodeWav(wav).isEmpty)
  }

  test("extractFeatures dispatches on magic bytes: PNG/WAV real, else stub") {
    val png = Multimodal.syntheticPng(3L, 4, 4)
    val wav = Multimodal.syntheticWav(3L, 16, 8000)
    assert(Multimodal.dispatchDecode(png).sum == 16.0)  // 16 pixels histogrammed
    assert(Multimodal.dispatchDecode(wav).sum == 16.0)  // 16 samples histogrammed
    val other = Array.tabulate[Byte](32)(_.toByte)
    assert(Multimodal.dispatchDecode(other).sum == 32.0) // stub: byte histogram
  }

  test("byteStats computes size and digest without decoding") {
    val out = Multimodal.byteStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_bytes") == 1000)
    assert(out(3L).isNullAt(out(3L).fieldIndex("n_bytes")))
    assert(out(0L).getAs[String]("digest").length == 32)
  }

  test("REAL AVI demux: syntheticAvi round-trips to the per-frame formula") {
    val id = 42L
    val got = Multimodal.decodeVideo(Multimodal.syntheticAvi(id, 8, 8, 4)).get
    assert(got.length == 4)
    def s(f: Int, c: Int) =
      (0 until 64).map(p => (id * 7919 + f * 523 + p * 257 + c * 101) % 256).sum
    got.foreach { fr =>
      assert(fr == Multimodal.VideoFrame(fr.frameIdx, 8, 8,
        s(fr.frameIdx, 0), s(fr.frameIdx, 1), s(fr.frameIdx, 2)))
    }
    assert(got.map(_.frameIdx).toSeq == Seq(0, 1, 2, 3))
  }

  test("REAL MJPEG: JPEG-encoded 00dc frames demux and ImageIO-decode") {
    // true MJPEG (lossy) — structure must be exact, pixels near the formula
    val avi = Multimodal.syntheticAvi(5L, 16, 16, 3, codec = "jpg")
    val raw = Multimodal.demuxAvi(avi).get
    assert(raw.length == 3)
    assert(raw.forall(f => (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)) // JPEG SOI
    val frames = Multimodal.decodeVideo(avi).get
    assert(frames.length == 3 && frames.forall(f => f.width == 16 && f.height == 16))
    // JPEG error is bounded: channel mean within ±16 of the lossless mean
    def mean(f: Int, c: Int) =
      (0 until 256).map(p => (5L * 7919 + f * 523 + p * 257 + c * 101) % 256).sum / 256.0
    frames.foreach { fr =>
      assert(math.abs(fr.sumR / 256.0 - mean(fr.frameIdx, 0)) < 16.0)
      assert(math.abs(fr.sumB / 256.0 - mean(fr.frameIdx, 2)) < 16.0)
    }
  }

  test("AVI demux: corrupt containers degrade to None, never throw or spin") {
    assert(Multimodal.demuxAvi(null).isEmpty)
    assert(Multimodal.demuxAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.demuxAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // lying chunk size: declared size overruns the buffer → abort, not spin
    val avi = Multimodal.syntheticAvi(1L, 8, 8, 2)
    val truncated = avi.take(avi.length / 2)
    assert(Multimodal.demuxAvi(truncated).isEmpty)
    // negative declared size inside movi must abort too
    val mangled = avi.clone()
    val movi = {  // find 'movi', then corrupt the first frame chunk's size
      var i = 12; while (!(mangled(i) == 'm' && mangled(i + 1) == 'o' &&
        mangled(i + 2) == 'v' && mangled(i + 3) == 'i')) i += 1
      i
    }
    mangled(movi + 11) = 0xff.toByte // size hi-byte → negative int
    assert(Multimodal.demuxAvi(mangled).isEmpty)
  }

  test("frame sampling: every k-th REAL frame, decode only kept frames") {
    import spark.implicits._
    val df = Seq(10L, 11L).toDF("media_id")
      .withColumn("payload", udf((id: Long) => Multimodal.syntheticAvi(id, 8, 8, 6)).apply(col("media_id")))
    val out = Multimodal.sampleFrames(df, everyK = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[Int]("n_frames_sampled") == 3)
    val idxs = out(10L).getAs[scala.collection.Seq[Row]]("frames")
      .map(_.getAs[Int]("frameIdx")).toSeq
    assert(idxs == Seq(0, 2, 4)) // stream indices preserved, not renumbered
    // null / non-AVI payload -> 0 sampled frames
    val bad = Multimodal.sampleFrames(
      Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"), everyK = 2)
    assert(bad.collect().head.getAs[Int]("n_frames_sampled") == 0)
  }

  test("dispatchDecode routes AVI through the real demuxer") {
    val avi = Multimodal.syntheticAvi(9L, 8, 8, 5)
    val hist = Multimodal.dispatchDecode(avi)
    assert(hist.sum == 5.0) // one histogram vote per decoded frame
  }

  test("dHash: re-encoded and resized copies collide; byte digest misses them") {
    val png = Multimodal.syntheticBlockImage(40L, 16, 16, 2)
    val bmp = Multimodal.syntheticBlockImage(40L, 16, 16, 2, format = "bmp")
    val small = Multimodal.syntheticBlockImage(40L, 8, 8, 1)
    val edited = Multimodal.syntheticBlockImage(40L, 16, 16, 2, bumpBlock0 = true)
    val other = Multimodal.syntheticBlockImage(41L, 16, 16, 2)
    // different container bytes (byte-digest dedup sees three distinct files)
    assert(!java.util.Arrays.equals(png, bmp) && !java.util.Arrays.equals(png, small))
    val Seq(hPng, hBmp, hSmall, hEdit, hOther) =
      Seq(png, bmp, small, edited, other).map(Multimodal.dHash(_).get)
    assert(hPng == hBmp)   // re-encode: same pixels, same perceptual hash
    assert(hPng == hSmall) // NN-downsample preserves the 8x8 block structure
    assert(java.lang.Long.bitCount(hPng ^ hEdit) <= 1) // one tile -> <= 1 comparison
    assert(java.lang.Long.bitCount(hPng ^ hOther) > 3) // unrelated image: far
    assert(hPng >= 0L && (hPng >> 56) == 0L)           // 56-bit, band-range-safe
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("dHash pairs through simhashPairs catch the planted near-dup quad") {
    import spark.implicits._
    val payloads = (40L to 47L).map { id =>
      val v = id % 8
      val iid = if (v >= 1 && v <= 3) id - v else id
      id -> (v match {
        case 1 => Multimodal.syntheticBlockImage(iid, 16, 16, 2, format = "bmp")
        case 2 => Multimodal.syntheticBlockImage(iid, 8, 8, 1)
        case 3 => Multimodal.syntheticBlockImage(iid, 16, 16, 2, bumpBlock0 = true)
        case _ => Multimodal.syntheticBlockImage(iid, 16, 16, 2)
      })
    }
    val hashes = Multimodal.perceptualHashes(payloads.toDF("media_id", "payload"))
      .select(col("media_id").as("doc"), col("dhash").as("simhash"))
    val pairs = Dedup.simhashPairs(hashes, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val quad = Set((40L, 41L), (40L, 42L), (40L, 43L), (41L, 42L), (41L, 43L), (42L, 43L))
    assert(quad.subsetOf(pairs))          // the full planted cluster is found
    assert(pairs.forall { case (a, b) => a / 8 == b / 8 && a >= 40 && b <= 43 })
  }

  test("pHash: gamma copies collide EXACTLY; dHash misses most of them (the r7 gap)") {
    // per-channel gamma c↦⌊c²/255⌋ on the bright-R corpus: strictly
    // monotone on the R channel pHash rank-equalizes (exact invariance),
    // NOT order-preserving on the r+g+b sums dHash compares
    var dMissed = 0
    for (k <- 0 until 200) {
      val iid = k * 8L
      val o = Multimodal.syntheticBlockImage(iid, 16, 16, 2, brightR = true)
      val g = Multimodal.syntheticBlockImage(iid, 16, 16, 2, gamma = true, brightR = true)
      assert(Multimodal.pHash(o).get == Multimodal.pHash(g).get,
        s"pHash must be exactly gamma-invariant (iid=$iid)")
      if (java.lang.Long.bitCount(Multimodal.dHash(o).get ^ Multimodal.dHash(g).get) > 3)
        dMissed += 1
    }
    assert(dMissed > 100, s"gamma should defeat dHash on most images ($dMissed/200)")
    // re-encode and downsample still collide; unrelated images are far
    val o = Multimodal.syntheticBlockImage(40L, 16, 16, 2, brightR = true)
    assert(Multimodal.pHash(o).get ==
      Multimodal.pHash(Multimodal.syntheticBlockImage(40L, 16, 16, 2, format = "bmp", brightR = true)).get)
    assert(Multimodal.pHash(o).get ==
      Multimodal.pHash(Multimodal.syntheticBlockImage(40L, 8, 8, 1, brightR = true)).get)
    val other = Multimodal.pHash(Multimodal.syntheticBlockImage(41L, 16, 16, 2, brightR = true)).get
    assert(java.lang.Long.bitCount(Multimodal.pHash(o).get ^ other) > 3)
    assert(Multimodal.pHash(o).get >= 0L && (Multimodal.pHash(o).get >> 56) == 0L)
    assert(Multimodal.pHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("spectralFingerprint: EQ-shifted copies collide EXACTLY; energy-order fp misses them") {
    var eMissed = 0
    for (k <- 0 until 200) {
      val aid = k * 8L
      val o = Multimodal.syntheticBandWav(aid)
      val eq = Multimodal.syntheticBandWav(aid, g1 = 3, g2 = 1)
      assert(Multimodal.spectralFingerprint(o).get == Multimodal.spectralFingerprint(eq).get,
        s"spectral fp must be exactly EQ-invariant (aid=$aid)")
      // the pre-r8 energy-order fingerprint on the same payloads: total
      // frame energies 64·(9a1²+a2²) vs 64·(a1²+a2²) reorder
      if (java.lang.Long.bitCount(
          Multimodal.audioFingerprint(o).get ^ Multimodal.audioFingerprint(eq).get) > 3)
        eMissed += 1
    }
    assert(eMissed > 100, s"EQ shift should defeat the energy-order fp on most streams ($eMissed/200)")
    // noise-added copies: energy margins absorb +-3 amplitude noise
    var noiseOk = 0
    for (k <- 0 until 200) {
      val aid = k * 8L
      val d = java.lang.Long.bitCount(
        Multimodal.spectralFingerprint(Multimodal.syntheticBandWav(aid)).get ^
        Multimodal.spectralFingerprint(Multimodal.syntheticBandWav(aid, noise = true)).get)
      if (d <= 3) noiseOk += 1
    }
    assert(noiseOk == 200, s"noise copies must stay within the hamming bar ($noiseOk/200)")
    val o = Multimodal.syntheticBandWav(40L)
    // uniform gain still collides on BOTH fingerprints; edit flips <= 1 bit
    val gain = Multimodal.syntheticBandWav(40L, g1 = 2, g2 = 2)
    assert(Multimodal.spectralFingerprint(o).get == Multimodal.spectralFingerprint(gain).get)
    assert(Multimodal.audioFingerprint(o).get == Multimodal.audioFingerprint(gain).get)
    val edit = Multimodal.spectralFingerprint(Multimodal.syntheticBandWav(40L, bumpFrame0 = true)).get
    assert(java.lang.Long.bitCount(Multimodal.spectralFingerprint(o).get ^ edit) <= 1)
    val other = Multimodal.spectralFingerprint(Multimodal.syntheticBandWav(41L)).get
    assert(java.lang.Long.bitCount(Multimodal.spectralFingerprint(o).get ^ other) > 3)
    assert(Multimodal.spectralFingerprint(o).get >= 0L &&
      (Multimodal.spectralFingerprint(o).get >> 56) == 0L)
    assert(Multimodal.spectralFingerprint(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audio tokens: cropped copies found by Jaccard; BOTH bit-position fps miss them") {
    var energyMissed = 0
    var spectralMissed = 0
    for (k <- 0 until 100) {
      val aid = k * 8L
      val o = Multimodal.syntheticBandWav(aid)
      val cr = Multimodal.syntheticBandWav(aid, crop = 2)
      // bit-position fingerprints misalign on a temporal crop
      if (java.lang.Long.bitCount(
          Multimodal.audioFingerprint(o).get ^ Multimodal.audioFingerprint(cr).get) > 3)
        energyMissed += 1
      if (java.lang.Long.bitCount(
          Multimodal.spectralFingerprint(o).get ^ Multimodal.spectralFingerprint(cr).get) > 3)
        spectralMissed += 1
      // token shingle sets: the cropped copy keeps 25 of the original's 27
      // 3-grams -> Jaccard 25/27, far above the 0.8 bar
      val ot = Multimodal.audioTokens(o).get.split(" ")
      val ct = Multimodal.audioTokens(cr).get.split(" ")
      assert(ct.toSeq == ot.drop(2).toSeq, "crop must be a pure token-prefix loss")
      val osh = ot.sliding(3).map(_.mkString(" ")).toSet
      val csh = ct.sliding(3).map(_.mkString(" ")).toSet
      val j = csh.intersect(osh).size.toDouble / csh.union(osh).size
      assert(j >= 0.8, s"crop copy must clear the Jaccard bar (aid=$aid, j=$j)")
      // gain invariance of the tokens: exact (gcd-reduced rationals)
      assert(Multimodal.audioTokens(Multimodal.syntheticBandWav(aid, g1 = 2, g2 = 2)).get
        == Multimodal.audioTokens(o).get)
    }
    assert(energyMissed > 90, s"crop should defeat the energy-order fp ($energyMissed/100)")
    assert(spectralMissed > 90, s"crop should defeat the spectral fp ($spectralMissed/100)")
  }

  test("video tokens: cropped copies found by Jaccard; the trajectory fp misses them") {
    val F = Multimodal.VideoFpFrames
    var fpMissed = 0
    for (k <- 0 until 100) {
      val vid = k * 8L
      val o = Multimodal.syntheticFrameAvi(vid, F, 2, 2)
      val cr = Multimodal.syntheticFrameAvi(vid, F, 2, 2, crop = 2)
      // the bit-position luminance-trajectory fingerprint misaligns on a crop
      if (java.lang.Long.bitCount(
          Multimodal.videoFingerprint(o).get ^ Multimodal.videoFingerprint(cr).get) > 3)
        fpMissed += 1
      // token shingle sets: the cropped copy keeps 53 of the original's 55
      // 3-grams -> Jaccard 53/55, far above the 0.8 bar
      val ot = Multimodal.videoTokens(o).get.split(" ")
      val ct = Multimodal.videoTokens(cr).get.split(" ")
      assert(ct.toSeq == ot.drop(2).toSeq, "crop must be a pure token-prefix loss")
      val osh = ot.sliding(3).map(_.mkString(" ")).toSet
      val csh = ct.sliding(3).map(_.mkString(" ")).toSet
      val j = csh.intersect(osh).size.toDouble / csh.union(osh).size
      assert(j >= 0.8, s"crop copy must clear the Jaccard bar (vid=$vid, j=$j)")
      // brightness-gain invariance of the tokens: exact (gcd-reduced triples)
      assert(Multimodal.videoTokens(Multimodal.syntheticFrameAvi(vid, F, 2, 2, gain = 2)).get
        == Multimodal.videoTokens(o).get)
      // spatial-rescale invariance: the pixel-count factor cancels too
      assert(Multimodal.videoTokens(Multimodal.syntheticFrameAvi(vid, F, 1, 1)).get
        == Multimodal.videoTokens(o).get)
    }
    assert(fpMissed > 90, s"crop should defeat the trajectory fp ($fpMissed/100)")
  }

  test("image tokens: banner-cropped copies found by Jaccard; the fixed-grid dHash misses them") {
    // 12×12 tiles / 2-row crop: 6 of dHash's 8 sampled rows shift (an 8×8
    // grid with a 1-row crop moves only one sampled row — measured 47/100
    // missed, i.e. the crop must be deep enough relative to the grid for
    // the MOTIVATION to hold; the token path is crop-depth-insensitive
    // until the Jaccard bar)
    val T = 12
    var dhashMissed = 0
    for (k <- 0 until 100) {
      val iid = k * 8L
      val o = Multimodal.syntheticTileImage(iid, T, T, 2)
      val cr = Multimodal.syntheticTileImage(iid, T, T, 2, cropTopRows = 2)
      if (java.lang.Long.bitCount(Multimodal.dHash(o).get ^ Multimodal.dHash(cr).get) > 3)
        dhashMissed += 1
      // token sets: crop of two tile rows = pure 24-token prefix loss
      val ot = Multimodal.imageTokens(o).get.split(" ")
      val ct = Multimodal.imageTokens(cr).get.split(" ")
      assert(ot.length == T * T && ct.length == T * (T - 2))
      assert(ct.toSeq == ot.drop(2 * T).toSeq, "crop must be a pure token-prefix loss")
      val osh = ot.sliding(3).map(_.mkString(" ")).toSet
      val csh = ct.sliding(3).map(_.mkString(" ")).toSet
      val j = csh.intersect(osh).size.toDouble / csh.union(osh).size
      assert(j >= 0.8, s"crop copy must clear the Jaccard bar (iid=$iid, j=$j)")
      // brightness-gain invariance of the tokens: exact (gcd-reduced triples)
      assert(Multimodal.imageTokens(Multimodal.syntheticTileImage(iid, T, T, 2, gain = 2)).get
        == Multimodal.imageTokens(o).get)
    }
    assert(dhashMissed > 90, s"banner crop should defeat dHash ($dhashMissed/100)")
  }

  test("2-D image crops: wide rows make row-major token SETS side-crop-robust; narrow rows fail") {
    def jac(a: String, b: String) = {
      val as = a.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val bs = b.split(" ").sliding(3).map(_.mkString(" ")).toSet
      as.intersect(bs).size.toDouble / as.union(bs).size
    }
    for (k <- 0 until 50) {
      val iid = k * 16L
      // the 1-D entry's 12-wide grid: a left-column crop drops J below the
      // bar (row-interior shingles are only 9 of 12 per row) — the measured
      // motivation for the WIDE grid, not for separator tokens (a
      // separator variant measured within noise of plain tokens: shingle
      // sets never cared about position)
      val n12 = Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 12, 12, 2, format = "bmp")).get
      val n12lc = Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 12, 12, 2, cropLeftCols = 1, format = "bmp")).get
      assert(jac(n12, n12lc) < 0.8, s"narrow rows should fail the side crop (iid=$iid)")
      // the 24-wide grid: BOTH crop axes clear the bar with plain tokens
      val o = Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 24, 12, 2, format = "bmp")).get
      val lc = Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 24, 12, 2, cropLeftCols = 1, format = "bmp")).get
      val tc = Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 24, 12, 2, cropTopRows = 2, format = "bmp")).get
      assert(jac(o, lc) >= 0.8, s"side crop must clear the bar on wide rows (iid=$iid, j=${jac(o, lc)})")
      assert(jac(o, tc) >= 0.8, s"banner crop must clear the bar (iid=$iid)")
      // gain invariance; and the BMP fast path decodes identically to ImageIO
      assert(Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 24, 12, 2, gain = 2, format = "bmp")).get == o)
      assert(Multimodal.imageTokens(
        Multimodal.syntheticTileImage(iid, 24, 12, 2)).get == o,
        "png/ImageIO path must token-match the bmp fast path")
    }
  }

  test("cross-modal CC: the union graph merges components neither modality alone forms") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    def nComponents(pairs: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.keepListConverged(d, "doc_id", pairs)
        .select(col("canonical")).distinct().count()
    val textPairs = graft.queries.TextDedupQueries.sharedPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val imgPairs = graft.queries.MultimodalQueries.mmImageDedup(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val nText = nComponents(textPairs)
    val nImg = nComponents(imgPairs)
    val mm = graft.queries.MultimodalQueries.dedupMultimodalCc(spark, dir)
    val nMm = mm.select(col("canonical")).distinct().count()
    assert(nMm < nText && nMm < nImg,
      s"union must merge across modalities: text=$nText img=$nImg mm=$nMm")
    assert(mm.count() == d.count(), "every doc labeled exactly once")
  }

  test("audioFingerprint: gain-doubled and decimated copies collide; byte digest misses them") {
    val F = Multimodal.AudioFpFrames
    val orig = Multimodal.syntheticFrameWav(40L, F, 64)
    val gain = Multimodal.syntheticFrameWav(40L, F, 64, gain = 2)
    val deci = Multimodal.syntheticFrameWav(40L, F, 64, decimate = 2)
    val edit = Multimodal.syntheticFrameWav(40L, F, 64, bumpFrame0 = true)
    val other = Multimodal.syntheticFrameWav(41L, F, 64)
    // disjoint bytes (byte-digest dedup sees three distinct files)
    assert(!java.util.Arrays.equals(orig, gain) && !java.util.Arrays.equals(orig, deci))
    val Seq(hO, hG, hD, hE, hX) =
      Seq(orig, gain, deci, edit, other).map(Multimodal.audioFingerprint(_).get)
    assert(hO == hG) // gain ×2: every energy ×4 — order preserved exactly
    assert(hO == hD) // half-rate decimation: every energy ×1/2 — same
    assert(java.lang.Long.bitCount(hO ^ hE) <= 1) // frame 0 joins bit 0 only
    assert(java.lang.Long.bitCount(hO ^ hX) > 3)  // unrelated stream: far
    assert(hO >= 0L && (hO >> 56) == 0L)          // 56-bit, band-range-safe
    assert(Multimodal.audioFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // real decode feeds the fingerprint: the gain copy differs in every
    // sample aggregate yet collides perceptually
    assert(Multimodal.decodeWav(gain).get.sumAmp != Multimodal.decodeWav(orig).get.sumAmp)
  }

  test("audio fingerprints through simhashPairs catch the planted near-dup quad") {
    import spark.implicits._
    val F = Multimodal.AudioFpFrames
    val payloads = (40L to 47L).map { id =>
      val v = id % 8
      val aid = if (v >= 1 && v <= 3) id - v else id
      id -> (v match {
        case 1 => Multimodal.syntheticFrameWav(aid, F, 64, gain = 2)
        case 2 => Multimodal.syntheticFrameWav(aid, F, 64, decimate = 2)
        case 3 => Multimodal.syntheticFrameWav(aid, F, 64, bumpFrame0 = true)
        case _ => Multimodal.syntheticFrameWav(aid, F, 64)
      })
    }
    val hashes = Multimodal.audioFingerprints(payloads.toDF("media_id", "payload"))
      .select(col("media_id").as("doc"), col("afp").as("simhash"))
    val pairs = Dedup.simhashPairs(hashes, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val quad = Set((40L, 41L), (40L, 42L), (40L, 43L), (41L, 42L), (41L, 43L), (42L, 43L))
    assert(quad.subsetOf(pairs))
    assert(pairs.forall { case (a, b) => a / 8 == b / 8 && a >= 40 && b <= 43 })
  }

  test("decodeBmp24 fast path: parity with ImageIO both directions; corrupt headers fall through") {
    // ImageIO-WRITTEN BMP → the direct parser must agree with an ImageIO read
    val io = Multimodal.syntheticBlockImage(7L, 16, 16, 2, format = "bmp")
    val fast = Multimodal.decodeBmp24(io).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(io))
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    assert((fast.width, fast.height, fast.sumR, fast.sumG, fast.sumB) ==
      (img.getWidth, img.getHeight, sr, sg, sb))
    // OWN encode → ImageIO must read back the exact pixels (spatial, not
    // just sums: catches a flipped row order or BGR/RGB swap)
    val px = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x102030, 0x405060, 0x708090)
    val own = Multimodal.encodeBmp24(3, 2, px)
    val rd = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(own))
    val got = Array.tabulate(6)(i => rd.getRGB(i % 3, i / 3) & 0xffffff)
    assert(got.sameElements(px))
    assert(Multimodal.decodeBmp24(own).get ==
      Multimodal.decodeImage(own).get) // the fast path IS decodeImage here
    // corrupt/unusual forms degrade to None (caller falls back to ImageIO)
    assert(Multimodal.decodeBmp24(own.take(30)).isEmpty)     // truncated
    val lying = own.clone(); lying(22) = 100                 // height > data
    assert(Multimodal.decodeBmp24(lying).isEmpty)
    val huge = own.clone()                                   // crafted dims
    huge(18) = -1; huge(19) = -1; huge(20) = 0x7f.toByte; huge(21) = 0
    assert(Multimodal.decodeBmp24(huge).isEmpty)
    assert(Multimodal.decodeBmp24(Multimodal.syntheticPng(1L, 4, 4)).isEmpty)
  }

  test("videoFingerprint: brightness-doubled and rescaled copies collide; byte digest misses them") {
    val F = Multimodal.VideoFpFrames
    val orig = Multimodal.syntheticFrameAvi(40L, F, 2, 2)
    val gain = Multimodal.syntheticFrameAvi(40L, F, 2, 2, gain = 2, codec = "png")
    val half = Multimodal.syntheticFrameAvi(40L, F, 1, 1)
    val edit = Multimodal.syntheticFrameAvi(40L, F, 2, 2, bumpFrame0 = true)
    val other = Multimodal.syntheticFrameAvi(41L, F, 2, 2)
    // disjoint bytes (byte-digest dedup sees three distinct files)
    assert(!java.util.Arrays.equals(orig, gain) && !java.util.Arrays.equals(orig, half))
    val Seq(hO, hG, hH, hE, hX) =
      Seq(orig, gain, half, edit, other).map(Multimodal.videoFingerprint(_).get)
    assert(hO == hG) // brightness ×2: every gray sum ×2 — order preserved exactly
    assert(hO == hH) // 1×1 rescale: every gray sum ×1/4 — same
    assert(java.lang.Long.bitCount(hO ^ hE) <= 1) // frame 0 joins bit 0 only
    assert(java.lang.Long.bitCount(hO ^ hX) > 3)  // unrelated stream: far
    assert(hO >= 0L && (hO >> 56) == 0L)          // 56-bit, band-range-safe
    assert(Multimodal.videoFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // real demux + decode feed the fingerprint: the gain copy differs in
    // every frame's channel sums yet collides perceptually
    val sumR0 = Multimodal.decodeVideo(orig).get.head.sumR
    assert(Multimodal.decodeVideo(gain).get.head.sumR == 2 * sumR0)
  }

  test("video fingerprints through simhashPairs catch the planted near-dup quad") {
    import spark.implicits._
    val F = Multimodal.VideoFpFrames
    val payloads = (40L to 47L).map { id =>
      val v = id % 8
      val vid = if (v >= 1 && v <= 3) id - v else id
      id -> (v match {
        case 1 => Multimodal.syntheticFrameAvi(vid, F, 2, 2, gain = 2, codec = "png")
        case 2 => Multimodal.syntheticFrameAvi(vid, F, 1, 1)
        case 3 => Multimodal.syntheticFrameAvi(vid, F, 2, 2, bumpFrame0 = true)
        case _ => Multimodal.syntheticFrameAvi(vid, F, 2, 2)
      })
    }
    val hashes = Multimodal.videoFingerprints(payloads.toDF("media_id", "payload"))
      .select(col("media_id").as("doc"), col("vfp").as("simhash"))
    val pairs = Dedup.simhashPairs(hashes, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val quad = Set((40L, 41L), (40L, 42L), (40L, 43L), (41L, 42L), (41L, 43L), (42L, 43L))
    assert(quad.subsetOf(pairs))
    assert(pairs.forall { case (a, b) => a / 8 == b / 8 && a >= 40 && b <= 43 })
  }

  test("resize folds histogram bins shape-preservingly") {
    val out = Multimodal.resizeFeatures(Multimodal.extractFeatures(media), bins = 4)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[scala.collection.Seq[Double]]("features"))).toMap
    assert(out(0L).get.length == 4)
    assert(out(0L).get.sum == 256.0)
  }
}
