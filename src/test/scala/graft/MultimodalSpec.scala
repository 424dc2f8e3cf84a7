package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", "fakejpegbytes".getBytes("UTF-8"), Map("src" -> "cam1")))
    rows.add(Row(2L, "audio", Array.fill[Byte](2500)(7), Map.empty[String, String]))
    rows.add(Row(3L, "image", null, Map.empty[String, String]))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("extractFeatures: distributed stub decode, deterministic, null-safe") {
    val f = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(f.length == 3)
    assert(f(0).getAs[Long]("n_bytes") == 13L)
    assert(f(0).getAs[Int]("width") > 0 && f(0).getAs[Int]("height") > 0)
    assert(f(1).getAs[Double]("duration_s") == 2.5)
    assert(f(2).getAs[Long]("n_bytes") == 0L) // null payload survives
    assert(f.forall(_.getSeq[Float](6).length == 4))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(f.map(_.getSeq[Float](6).toList).toSeq ==
      again.map(_.getSeq[Float](6).toList).toSeq)
  }

  // --- real decoders -------------------------------------------------

  private def pgm(header: String, pixels: Array[Int]): Array[Byte] =
    header.getBytes("US-ASCII") ++ pixels.map(_.toByte)

  test("decodePgm: P5 header parse + exact intensity histogram") {
    // 2x2 gray: one pixel per dim-4 bin
    val img = pgm("P5\n2 2\n255\n", Array(0, 64, 128, 255))
    val Some((w, h, hist)) = Multimodal.decodePgm(img, dim = 4)
    assert((w, h) == (2, 2))
    assert(hist.toSeq == Seq(1f, 1f, 1f, 1f))
    // comments + arbitrary whitespace are legal netpbm header grammar
    val commented = pgm("P5 # a comment\n# another\n 2\t1 # w h\n15\n", Array(3, 15))
    val Some((w2, h2, hist2)) = Multimodal.decodePgm(commented, dim = 4)
    assert((w2, h2) == (2, 1))
    // maxval 15: bins over [0,15] -> 3*4/16=0, 15*4/16=3
    assert(hist2.toSeq == Seq(1f, 0f, 0f, 1f))
  }

  test("decodePgm: P6 counts every RGB sample; malformed inputs refuse") {
    val rgb = pgm("P6\n1 2\n255\n", Array(0, 0, 0, 255, 255, 255))
    val Some((w, h, hist)) = Multimodal.decodePgm(rgb, dim = 2)
    assert((w, h) == (1, 2))
    assert(hist.toSeq == Seq(3f, 3f))
    assert(Multimodal.decodePgm(pgm("P5\n2 2\n255\n", Array(1, 2, 3)), 4).isEmpty,
      "truncated raster must refuse")
    assert(Multimodal.decodePgm("P7\n2 2\n255\n xxxx".getBytes, 4).isEmpty)
    assert(Multimodal.decodePgm("plain text that is not an image".getBytes, 4).isEmpty)
    assert(Multimodal.decodePgm(pgm("P5\n2 2\n70000\n", Array(1, 2, 3, 4)), 4).isEmpty,
      "maxval > 255 (16-bit netpbm) is out of scope and must refuse")
  }

  private def wav(bits: Int, channels: Int, rate: Int, frames: Array[Int]): Array[Byte] = {
    val bytesPerSample = bits / 8
    val block = channels * bytesPerSample
    val dataLen = frames.length * block
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * block); bb.putShort(block.toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    frames.foreach { s =>
      (0 until channels).foreach { _ =>
        if (bits == 8) bb.put((s + 128).toByte) else bb.putShort(s.toShort)
      }
    }
    bb.array()
  }

  test("decodeWav: duration from fmt/data chunks, per-segment peak envelope") {
    // 8-bit mono 8 kHz, 4 frames: centered amplitudes 0,0,100,-100
    val w8 = wav(8, 1, 8000, Array(0, 0, 100, -100))
    val Some((dur, peaks)) = Multimodal.decodeWav(w8, dim = 2)
    assert(dur == 4.0 / 8000)
    assert(peaks.toSeq == Seq(0f, 100f))
    // 16-bit stereo 44.1 kHz (channel 0 read per frame)
    val w16 = wav(16, 2, 44100, Array(0, -32768, 1000, 500))
    val Some((dur16, peaks16)) = Multimodal.decodeWav(w16, dim = 2)
    assert(dur16 == 4.0 / 44100)
    assert(peaks16.toSeq == Seq(32768f, 1000f))
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes, 2).isEmpty)
    assert(Multimodal.decodeWav(w8.take(30), 2).isEmpty, "truncated chunk must refuse")
  }

  test("encodePcmWav -> decodeWav roundtrip recovers duration and envelope") {
    // 8 unsigned samples at 8 kHz: amplitudes |b-128| = 96,0,96,28 ... per pair
    val samples = Array(32, 128, 224, 100, 128, 128, 200, 27).map(_.toByte)
    val wavBytes = Multimodal.encodePcmWav(8000, samples)
    assert(new String(wavBytes.take(4)) == "RIFF" && wavBytes.length == 52)
    val Some((dur, peaks)) = Multimodal.decodeWav(wavBytes, dim = 4)
    assert(dur == 8.0 / 8000)
    assert(peaks.toSeq == Seq(96f, 96f, 0f, 101f))
  }

  test("extractFeatures dispatches real decoders by content, stub otherwise") {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", pgm("P5\n3 1\n255\n", Array(10, 70, 200)), Map.empty[String, String]))
    rows.add(Row(2L, "audio", wav(8, 1, 1000, Array(50, -50)), Map.empty[String, String]))
    rows.add(Row(3L, "image", "not a real format".getBytes, Map.empty[String, String]))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(df, dim = 4).orderBy("media_id").collect()
    assert(f(0).getAs[Int]("width") == 3 && f(0).getAs[Int]("height") == 1)
    assert(f(0).getSeq[Float](6) == Seq(1f, 1f, 0f, 1f))
    assert(f(1).getAs[Double]("duration_s") == 2.0 / 1000)
    // 2 frames over 4 segments: frame 0 -> seg 0, frame 1 -> seg 2
    assert(f(1).getSeq[Float](6) == Seq(50f, 0f, 50f, 0f))
    // unrecognized payload falls back to the deterministic stub
    assert(f(2).getAs[Int]("width") > 0 && f(2).getSeq[Float](6).length == 4)
  }

  test("decodeImageIO: gray PNG roundtrip recovers the exact raster histogram") {
    // one pixel per dim-4 bin; PNG is lossless so the histogram is exact
    val pixels = Array(0, 64, 128, 255).map(_.toByte)
    val png = Multimodal.encodeGrayPng(2, 2, pixels)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P', 'N', 'G'))
    val Some((w, h, hist)) = Multimodal.decodeImageIO(png, dim = 4)
    assert((w, h) == (2, 2))
    assert(hist.toSeq == Seq(1f, 1f, 1f, 1f))
  }

  test("decodeImageIO: real JPEG decode reads dimensions and pixels") {
    // JPEG is lossy, so assert structure (dims, mass) not exact bins
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 3; x <- 0 until 5)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val Some((w, h, hist)) = Multimodal.decodeImageIO(jpeg, dim = 4)
    assert((w, h) == (5, 3))
    assert(hist.sum == 15f, "every pixel lands in exactly one bin")
    // the checkerboard has mass at both intensity extremes even after
    // JPEG's lossy roundtrip
    assert(hist(0) > 0f && hist(3) > 0f)
  }

  test("decodeImageIO: junk, truncated and non-image payloads refuse") {
    assert(Multimodal.decodeImageIO("definitely not an image".getBytes, 4).isEmpty)
    assert(Multimodal.decodeImageIO(null, 4).isEmpty)
    val png = Multimodal.encodeGrayPng(4, 4, Array.fill[Byte](16)(7))
    assert(Multimodal.decodeImageIO(png.take(12), 4).isEmpty,
      "truncated PNG must refuse, not throw")
    val corrupt = png.clone()
    java.util.Arrays.fill(corrupt, 16, corrupt.length, 0x5a.toByte)
    assert(Multimodal.decodeImageIO(corrupt, 4).isEmpty,
      "corrupt PNG body must refuse, not throw")
  }

  test("decodeMedia gates decoders on declared kind, not byte luck") {
    // a PGM payload declared as audio keeps the audio stub shape
    val img = pgm("P5\n2 2\n255\n", Array(0, 64, 128, 255))
    val (w, h, d, _) = Multimodal.decodeMedia("audio", img, 4)
    assert(w.isEmpty && h.isEmpty && d.isDefined, "audio row must not grow pixels")
    // a WAV payload declared as image keeps the image stub shape
    val w8 = wav(8, 1, 8000, Array(0, 100))
    val (wi, hi, di, _) = Multimodal.decodeMedia("image", w8, 4)
    assert(wi.isDefined && hi.isDefined && di.isEmpty, "image row must not grow a duration")
    // and declared-kind payloads still get their real decoders
    assert(Multimodal.decodeMedia("image", img, 4)._1.contains(2))
    assert(Multimodal.decodeMedia("audio", w8, 4)._3.contains(2.0 / 8000))
    val png = Multimodal.encodeGrayPng(3, 1, Array(0, 100, 200).map(_.toByte))
    assert(Multimodal.decodeMedia("image", png, 4)._1.contains(3))
  }

  test("resizeImageIO: floor-NN on a gray PNG, exact pixels through the roundtrip") {
    val png = Multimodal.encodeGrayPng(2, 2, Array(10, 20, 30, 40).map(_.toByte))
    val Some(up) = Multimodal.resizeImageIO(png, 4, 4)
    val Some((w, h, _)) = Multimodal.decodeImageIO(up, 4)
    assert((w, h) == (4, 4))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    val samples = for (y <- 0 until 4; x <- 0 until 4)
      yield img.getRaster.getSample(x, y, 0)
    assert(samples == Seq(10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40))
    assert(Multimodal.resizeImageIO("not an image".getBytes, 2, 2).isEmpty)
  }

  test("resizePgm: real nearest-neighbor resample, exact pixels, format-preserving") {
    // 2x2 gray quadrants upsampled to 4x4: each source pixel becomes 2x2
    val img = pgm("P5\n2 2\n255\n", Array(10, 20, 30, 40))
    val Some(up) = Multimodal.resizePgm(img, 4, 4)
    val Some((w, h, _)) = Multimodal.decodePgm(up, 4)
    assert((w, h) == (4, 4))
    val raster = up.drop(up.length - 16).map(_ & 0xff).toSeq
    assert(raster == Seq(10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40))
    // 4x1 downsampled to 2x1 picks source columns 0 and 2 (floor NN)
    val wide = pgm("P5\n4 1\n255\n", Array(1, 2, 3, 4))
    val Some(down) = Multimodal.resizePgm(wide, 2, 1)
    assert(down.drop(down.length - 2).map(_ & 0xff).toSeq == Seq(1, 3))
    // P6 keeps channel triplets together
    val rgb = pgm("P6\n2 1\n255\n", Array(1, 2, 3, 4, 5, 6))
    val Some(rgbUp) = Multimodal.resizePgm(rgb, 4, 1)
    assert(rgbUp.drop(rgbUp.length - 12).map(_ & 0xff).toSeq ==
      Seq(1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6))
    assert(Multimodal.resizePgm("not an image".getBytes, 2, 2).isEmpty)
  }

  test("resizeImages dispatches the real resample for netpbm, stub truncation otherwise") {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", pgm("P5\n2 2\n255\n", Array(10, 20, 30, 40)), Map.empty[String, String]))
    rows.add(Row(2L, "image", "opaquejpegbytes".getBytes, Map.empty[String, String]))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val r = Multimodal.resizeImages(df, 4, 4).orderBy("media_id").collect()
    val real = r(0).getAs[Array[Byte]]("content")
    assert(Multimodal.decodePgm(real, 4).exists { case (w, h, _) => (w, h) == (4, 4) })
    assert(r(1).getAs[Array[Byte]]("content").toSeq ==
      "opaquejpegbytes".getBytes.take(16).toSeq)
  }

  test("sampleFrames: one row per sampled frame, capped") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2L),
      everyNth = 1, maxFrames = 2).collect()
    assert(frames.length == 2) // 2500 bytes -> 2 frames at stub rate, cap 2
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1))
  }

  test("resizeImages: images get payload + target dims, non-images pass through") {
    val r = Multimodal.resizeImages(media, targetW = 2, targetH = 3)
      .orderBy("media_id").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Array[Byte]]("content").toSeq ==
      "fakejp".getBytes("UTF-8").toSeq) // min(13, 2*3) stub bytes
    assert(r(0).getAs[Int]("width") == 2 && r(0).getAs[Int]("height") == 3)
    assert(r(1).getString(1) == "audio" &&
      r(1).getAs[Array[Byte]]("content").length == 2500) // untouched
    assert(r(1).isNullAt(3) && r(1).isNullAt(4))
    assert(r(2).isNullAt(2)) // null payload survives
  }

  test("repartitionForDecode sizes partitions by payload bytes") {
    val parts = Multimodal.repartitionForDecode(media, totalBytes = 4L << 30,
      targetBytesPerPartition = 1L << 30)
    assert(parts.rdd.getNumPartitions == 4)
  }

  test("decodeImageIO resolves palette-indexed pixels through the color table") {
    // 2x2 indexed image whose palette INVERTS the index order: index 0 is
    // WHITE, index 1 is BLACK — binning raw samples would put the white
    // pixels in the darkest bin
    val cmap = Array(0xffffff, 0x000000).flatMap(rgb =>
      Array(((rgb >> 16) & 0xff).toByte, ((rgb >> 8) & 0xff).toByte, (rgb & 0xff).toByte))
    val icm = new java.awt.image.IndexColorModel(8, 2,
      cmap.grouped(3).map(_(0)).toArray, cmap.grouped(3).map(_(1)).toArray,
      cmap.grouped(3).map(_(2)).toArray)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setSample(0, 0, 0, 0) // white via palette
    img.getRaster.setSample(1, 0, 0, 0) // white
    img.getRaster.setSample(0, 1, 0, 1) // black
    img.getRaster.setSample(1, 1, 0, 1) // black
    val bos = new java.io.ByteArrayOutputStream()
    // paletted PNG (the JDK GIF *writer* mangles tiny images; the decode
    // path under test — IndexColorModel resolution — is format-agnostic)
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, hist)) = Multimodal.decodeImageIO(bos.toByteArray, 8)
    assert((w, h) == ((2, 2)))
    assert(hist(7) == 2f, s"white pixels must land in the TOP bin, got ${hist.toSeq}")
    assert(hist(0) == 2f, s"black pixels in the bottom bin, got ${hist.toSeq}")
    // resize must also go through the palette (an indexed image written
    // as TYPE_BYTE_GRAY of raw indices would be near-black everywhere)
    val resized = Multimodal.resizeImageIO(bos.toByteArray, 2, 2).get
    val Some((_, _, rh)) = Multimodal.decodeImageIO(resized, 8)
    assert(rh(7) == 2f && rh(0) == 2f, s"palette lost in resize: ${rh.toSeq}")
  }

  // -------------------------------------------------------------------
  // dHash (perceptual image near-dup fingerprints)
  // -------------------------------------------------------------------

  private def p5(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    (s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ px)

  private def testRaster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 37 + (i / w) * 11) % 256).toByte)

  test("dHash60: hashing an image equals hashing its 11x6 NN resize") {
    val img = p5(22, 12, testRaster(22, 12))
    val small = Multimodal.resizePgm(img, 11, 6).get
    assert(Multimodal.dHash60(img).get == Multimodal.dHash60(small).get,
      "dHash must commute with the real NN resize (same kernel)")
    // and on a non-integer scale too
    val odd = p5(37, 17, testRaster(37, 17))
    val oddSmall = Multimodal.resizePgm(odd, 11, 6).get
    assert(Multimodal.dHash60(odd).get == Multimodal.dHash60(oddSmall).get)
  }

  test("dHash60: PNG container and raw P5 of the same raster hash identically") {
    val px = testRaster(22, 12)
    val viaP5 = Multimodal.dHash60(p5(22, 12, px)).get
    val viaPng = Multimodal.dHash60(Multimodal.encodeGrayPng(22, 12, px)).get
    assert(viaP5 == viaPng, "lossless PNG roundtrip must preserve the fingerprint")
  }

  test("dHash60: P6 gray-equal RGB matches P5; brightness shift is invariant") {
    val px = testRaster(22, 12)
    val p6 = (s"P6\n22 12\n255\n".getBytes("US-ASCII") ++
      px.flatMap(b => Array(b, b, b)))
    assert(Multimodal.dHash60(p6).get == Multimodal.dHash60(p5(22, 12, px)).get)
    // gradient bits survive a uniform brightness shift (no byte overflow)
    val dim0 = px.map(b => ((b & 0xff) / 2).toByte)
    val brighter = dim0.map(b => ((b & 0xff) + 100).toByte)
    assert(Multimodal.dHash60(p5(22, 12, dim0)).get ==
      Multimodal.dHash60(p5(22, 12, brighter)).get)
  }

  test("dHash60: a one-pixel edit moves at most 2 gradient bits; junk refuses") {
    val px = testRaster(22, 12)
    val edited = px.clone()
    edited(2 * 22 + 4) = (~edited(2 * 22 + 4)).toByte // sampled pixel (x=2,y=1)
    val a = Multimodal.dHash60(p5(22, 12, px)).get
    val b = Multimodal.dHash60(p5(22, 12, edited)).get
    val ham = java.lang.Long.bitCount(a ^ b)
    assert(ham >= 1 && ham <= 2, s"one sampled pixel flips 1-2 bits, got $ham")
    assert(Multimodal.dHash60("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash60(Array[Byte]()).isEmpty)
  }

  test("dHashSignatures/dHashPairs: null for undecodable, pairs find planted dups") {
    val px = testRaster(22, 12)
    val near = px.clone(); near(2 * 22 + 4) = (~near(2 * 22 + 4)).toByte
    val far = testRaster(22, 12).zipWithIndex.map { case (b, i) => (b ^ (i % 251)).toByte }
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", p5(22, 12, px), Map.empty[String, String]))
    rows.add(Row(2L, "image", p5(22, 12, px), Map.empty[String, String]))       // exact dup of 1
    rows.add(Row(3L, "image", p5(22, 12, near), Map.empty[String, String]))                 // near dup of 1
    rows.add(Row(4L, "image", p5(22, 12, far), Map.empty[String, String]))      // unrelated
    rows.add(Row(5L, "image", "junkbytes".getBytes("UTF-8"), Map.empty[String, String]))
    rows.add(Row(6L, "audio", p5(22, 12, px), Map.empty[String, String]))       // wrong kind
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val sigs = Multimodal.dHashSignatures(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(sigs(1).isDefined && sigs(1) == sigs(2))
    assert(sigs(5).isEmpty && sigs(6).isEmpty, "junk and non-image rows must be null")
    val pairs = Multimodal.dHashPairs(df, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"exact dup missing: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0, s"near dup missing: $pairs")
    assert(pairs.contains((2L, 3L)), "blocking recall: near dup of the dup too")
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L), s"unrelated image paired: $pairs")
  }

  // -------------------------------------------------------------------
  // audioHash (gain-invariant audio near-dup fingerprints)
  // -------------------------------------------------------------------

  private def pcm(samples: Array[Byte]): Array[Byte] =
    Multimodal.encodePcmWav(8000, samples)

  private def testSamples(n: Int): Array[Byte] =
    Array.tabulate(n)(i => (128 + ((i * 17 + i * i % 29) % 60) - 30).toByte)

  test("audioHash60: exactly invariant under uniform gain; sensitive to content") {
    val s0 = testSamples(480)
    val doubled = s0.map(b => (128 + ((b & 0xff) - 128) * 2).toByte) // no clip: |amp| <= 30
    assert(Multimodal.audioHash60(pcm(s0)).get == Multimodal.audioHash60(pcm(doubled)).get,
      "exact 2x gain must not move any mean-crossing bit")
    val halved = s0.map(b => (128 + ((b & 0xff) - 128) / 2).toByte) // integer re-quantization
    val ham = java.lang.Long.bitCount(
      Multimodal.audioHash60(pcm(s0)).get ^ Multimodal.audioHash60(pcm(halved)).get)
    assert(ham <= 4, s"re-quantized copy should stay near, got hamming $ham")
    val other = testSamples(480).zipWithIndex.map { case (b, i) =>
      (128 + ((i * 31 + 7) % 50) - 25).toByte }
    val far = java.lang.Long.bitCount(
      Multimodal.audioHash60(pcm(s0)).get ^ Multimodal.audioHash60(pcm(other)).get)
    assert(far > 6, s"unrelated audio should be far, got hamming $far")
    assert(Multimodal.audioHash60("notawav".getBytes("UTF-8")).isEmpty)
  }

  test("audioHashSignatures/audioHashPairs: kind gating and planted-copy recall") {
    val s0 = testSamples(480)
    val requant = s0.map(b => (128 + ((b & 0xff) - 128) / 2).toByte)
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "audio", pcm(s0), Map.empty[String, String]))
    rows.add(Row(2L, "audio", pcm(requant), Map.empty[String, String]))
    rows.add(Row(3L, "audio", "junk".getBytes("UTF-8"), Map.empty[String, String]))
    rows.add(Row(4L, "image", pcm(s0), Map.empty[String, String])) // wrong kind
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val sigs = Multimodal.audioHashSignatures(df).collect()
      .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(sigs == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    val pairs = Multimodal.audioHashPairs(df, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"expected only the planted pair: $pairs")
  }

  test("audioHashAligned60: silence trims/pads collapse to hamming 0; position-aligned hash misses them") {
    val s0 = testSamples(480)
    def padded(front: Int, back: Int): Array[Byte] =
      Array.fill[Byte](front)(0x80.toByte) ++ s0 ++ Array.fill[Byte](back)(0x80.toByte)
    val base = Multimodal.audioHashAligned60(pcm(s0)).get
    // any edge-silence variant hashes IDENTICALLY under alignment
    Seq((37, 23), (1, 0), (0, 200), (411, 97)).foreach { case (f, bk) =>
      assert(Multimodal.audioHashAligned60(pcm(padded(f, bk))).get == base,
        s"pad ($f,$bk) must be invisible to the aligned fingerprint")
    }
    // ...while the position-aligned fingerprint shifts every segment and
    // loses the copy — the gap this variant exists to close
    val posHam = java.lang.Long.bitCount(
      Multimodal.audioHash60(pcm(s0)).get ^
        Multimodal.audioHash60(pcm(padded(37, 23))).get)
    assert(posHam > 6, s"position-aligned hash should miss the padded copy, got hamming $posHam")
    // unrelated content stays far under alignment too
    val other = Array.tabulate(480)(i => (128 + ((i * 31 + 7) % 50) - 25).toByte)
    val far = java.lang.Long.bitCount(
      base ^ Multimodal.audioHashAligned60(pcm(other)).get)
    assert(far > 6, s"unrelated audio should be far, got hamming $far")
    // all-silence payload hashes to 0, not an error
    assert(Multimodal.audioHashAligned60(pcm(Array.fill[Byte](100)(0x80.toByte))).get == 0L)
    assert(Multimodal.audioHashAligned60("notawav".getBytes("UTF-8")).isEmpty)
  }

  test("dHash120: horizontal word equals dHash60; vertical word adds independent evidence; wide pairs recover planted near-dups") {
    // pixels capped below 215 so the +40 brightness shift never clips —
    // clipping flattens real gradients and is SUPPOSED to move bits
    val px = Array.tabulate(22 * 12)(i => ((i * 7 + (i / 22) * 13) % 200).toByte)
    val img = p5(22, 12, px)
    val wide = Multimodal.dHash120(img).get
    assert(wide.length == 2)
    assert(wide(0) == Multimodal.dHash60(img).get.longValue,
      "word 0 must be the existing horizontal dHash — one decode, superset fingerprint")
    // brightness shift leaves BOTH gradient words fixed (same invariance
    // the 60-bit hash proves)
    val brighter = p5(22, 12, px.map(b => ((b & 0xff) + 40).toByte))
    assert(Multimodal.dHash120(brighter).get.sameElements(wide))
    // a one-pixel edit at a grid-sampled position (col 4, row 4 — on
    // both planes' NN grids) moves at most a few bits across the words
    val edited = px.clone(); edited(4 * 22 + 4) = ((edited(4 * 22 + 4) & 0xff) ^ 0x80).toByte
    val we = Multimodal.dHash120(p5(22, 12, edited)).get
    val ham = java.lang.Long.bitCount(wide(0) ^ we(0)) + java.lang.Long.bitCount(wide(1) ^ we(1))
    assert(ham >= 1 && ham <= 6, s"one-pixel edit should land near, got hamming $ham")
    assert(Multimodal.dHash120("junk".getBytes("UTF-8")).isEmpty)
    // pair recall through the wide blocking core
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", img, Map.empty[String, String]))
    rows.add(Row(2L, "image", p5(22, 12, edited), Map.empty[String, String]))
    rows.add(Row(3L, "image", p5(22, 12, px.map(b => (255 - (b & 0xff)).toByte)), Map.empty[String, String]))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val pairs = Multimodal.dHashWidePairs(df, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the planted pair: $pairs")
  }

  test("audioAlignedPairs: planted trimmed copies recovered at hamming 0") {
    val s0 = testSamples(480)
    val trimmedCopy = Array.fill[Byte](37)(0x80.toByte) ++ s0 ++ Array.fill[Byte](23)(0x80.toByte)
    val other = Array.tabulate(480)(i => (128 + ((i * 31 + 7) % 50) - 25).toByte)
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "audio", pcm(s0), Map.empty[String, String]))
    rows.add(Row(2L, "audio", pcm(trimmedCopy), Map.empty[String, String]))
    rows.add(Row(3L, "audio", pcm(other), Map.empty[String, String]))
    val df = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val pairs = Multimodal.audioAlignedPairs(df, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0), s"expected the planted pair at hamming 0: $pairs")
  }
}
