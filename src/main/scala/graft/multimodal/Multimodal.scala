package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media travels as an opaque `BINARY` column with typed
  * metadata, and per-item decode / feature-extraction runs distributed via
  * `mapPartitions` over an `Iterator` — the Scala-side equivalent of a
  * batched `mapInPandas` UDF (same batch shape: one partition streams
  * through the codec without materializing).
  *
  * The codec dispatch ([[decodeMedia]]) is REAL for the public formats
  * that need no native libraries: binary netpbm images (PGM `P5` /
  * PPM `P6`: [[decodePgm]]), JPEG/PNG/GIF/BMP via the in-JDK
  * `javax.imageio` readers ([[decodeImageIO]]), and RIFF/WAVE PCM audio
  * ([[decodeWav]]) — each magic-byte detected and fully parsed before
  * trusting the payload, and gated on the row's declared `kind`.
  * Payloads in any other (or malformed) format fall back to the
  * deterministic [[decodeStub]], so the pipeline stays total; a
  * deployment adds richer codecs (video via JavaCV, …) by extending the
  * same dispatch — schema, partitioning, batch shape and null handling
  * don't change.
  *
  * Scale notes: media rows are large and skew-prone, so helpers
  * `repartitionForDecode` (spread by hash, decouple from upstream file
  * splits) and binary-size bucketing keep partitions within executor
  * memory at 100 TB.
  */
object Multimodal {

  /** Media row schema: id + opaque payload + declared metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Feature row produced by the decode/extract pass. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Stands in for the real image/audio decode (``???`` in production —
    * the container has no media libs). Deterministic by construction so
    * tests and oracles can replay it.
    *
    * The per-item seed is the first 60 bits of `md5(content)` — chosen
    * over a bespoke rolling hash precisely so any SQL engine can replay
    * the stub (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), giving the
    * multimodal pipeline a hard cross-engine oracle. Feature j is a
    * 12-bit slice of the seed over 4096 — a power-of-two denominator, so
    * the float is exact and float→double widening is lossless (no
    * rounding hazards in the oracle compare). */
  def decodeStub(kind: String, content: Array[Byte], dim: Int): (Option[Int], Option[Int], Option[Double], Array[Float]) = {
    val bytes = if (content == null) Array.empty[Byte] else content
    val n = bytes.length
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md5.map(b => f"${b & 0xff}%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60-bit, >= 0
    val features = Array.tabulate(dim) { j =>
      ((h >> ((4 * j) % 60)) & 0xfff).toFloat / 4096.0f
    }
    kind match {
      case "image" => (Some(((h & 0xff) + 1).toInt), Some((((h >> 8) & 0xff) + 1).toInt), None, features)
      case "audio" | "video" => (None, None, Some((n.toDouble / 1000.0)), features)
      case _ => (None, None, None, features)
    }
  }

  /** Real decoder: binary netpbm — PGM (`P5`, one gray byte per pixel)
    * and PPM (`P6`, three RGB bytes per pixel) with `maxval ≤ 255`.
    * Header grammar per the netpbm spec: magic, then whitespace-separated
    * width/height/maxval with `#`-to-EOL comments allowed between tokens,
    * then EXACTLY one whitespace byte before the raster. Returns
    * `(width, height, features)` where feature `j` counts raster sample
    * bytes falling in intensity bin `j` of `dim` equal bins over
    * `[0, maxval]` — an intensity histogram, integer-exact in float32 so
    * oracles replay it bit-for-bit. None (→ caller falls back to the
    * stub) on any malformed/truncated input. */
  /** Parsed binary-netpbm header: channels (1 = P5 gray, 3 = P6 RGB),
    * dimensions, maxval, and the raster's byte offset. None on anything
    * that is not a complete, in-bounds P5/P6 with maxval ≤ 255. */
  private[multimodal] def parseNetpbm(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
    parseNetpbm(bytes, 0)

  /** Header parse at an OFFSET into a shared buffer — no copy: the
    * returned raster offset is RELATIVE to `base`, so the zero-base
    * overload above is unchanged. This is what lets [[splitFrames]]
    * walk a long frame stream in O(total bytes) instead of copying the
    * remaining container per frame (ADVICE r15). */
  private[multimodal] def parseNetpbm(bytes: Array[Byte], base: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length - base < 2 || bytes(base) != 'P') return None
    val channels = bytes(base + 1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var i = base + 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // whitespace/comment skipper, then one decimal token
    def nextInt(): Option[Int] = {
      while (i < bytes.length && (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else i += 1
      }
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly one whitespace byte separates header from raster
      if i < bytes.length && isWs(bytes(i))
      if bytes.length - (i + 1) >= w.toLong * h * channels // raster in bounds
    } yield (channels, w, h, maxval, i + 1 - base)
  }

  def decodePgm(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    parseNetpbm(bytes).map { case (channels, w, h, maxval, off) =>
      val hist = new Array[Float](dim)
      var p = off
      val end = off + w * h * channels
      while (p < end) {
        val b = bytes(p) & 0xff
        val bin = math.min(dim - 1, b * dim / (maxval + 1))
        hist(bin) += 1f
        p += 1
      }
      (w, h, hist)
    }

  /** REAL nearest-neighbor resample of a binary netpbm payload to
    * `targetW × targetH` (source pixel `(x·w/tw, y·h/th)`, floor — the
    * standard NN kernel), re-encoded in the same format (P5/P6, same
    * maxval). None for non-netpbm payloads (→ caller falls back to the
    * stub truncation). Pure per-row CPU: O(tw·th·channels) writes with
    * no intermediate decode buffer. */
  def resizePgm(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    parseNetpbm(bytes).map { case (channels, w, h, maxval, off) =>
      val header = s"P${if (channels == 1) '5' else '6'}\n$targetW $targetH\n$maxval\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + targetW * targetH * channels)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var y = 0
      while (y < targetH) {
        val sy = (y.toLong * h / targetH).toInt
        var x = 0
        while (x < targetW) {
          val sx = (x.toLong * w / targetW).toInt
          val src = off + (sy * w + sx) * channels
          var c = 0
          while (c < channels) { out(o) = bytes(src + c); o += 1; c += 1 }
          x += 1
        }
        y += 1
      }
      out
    }

  /** Real decoder: RIFF/WAVE, integer PCM (format tag 1), 8-bit unsigned
    * or 16-bit signed little-endian. Walks the chunk list (chunks may
    * appear in any order and carry pad bytes), requires a complete `fmt `
    * and a `data` chunk within bounds. Returns `(duration_s, features)`:
    * duration = frames / sampleRate, feature `j` = peak |amplitude| of
    * channel 0 over the `j`-th of `dim` contiguous frame segments (a peak
    * envelope — integer-exact in float32 for both sample widths). None on
    * anything malformed. */
  /** RIFF/WAVE chunk walk shared by [[decodeWav]] and [[audioHash60]]:
    * `(rate, block, bits, dataOffset, dataLength)` for integer-PCM
    * payloads, None on anything malformed (see [[decodeWav]] rules). */
  private def parseWav(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, block, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val sz = u32(off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      val body = off + 8
      if (id == "fmt " && sz >= 16) {
        if (u16(body) != 1) return None // PCM only
        fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 12), u16(body + 14)))
      } else if (id == "data") data = Some((body, sz.toInt))
      off = body + sz.toInt + (sz.toInt & 1) // chunks are 2-byte aligned
    }
    for {
      (channels, rate, block, bits) <- fmt
      (dOff, dLen) <- data
      if channels > 0 && rate > 0 && block == channels * (bits / 8) &&
        (bits == 8 || bits == 16)
    } yield (rate, block, bits, dOff, dLen)
  }

  /** Channel-0 |amplitude| of frame `f` (integer-exact for both widths). */
  @inline private def frameAmp(bytes: Array[Byte], dOff: Int, block: Int,
      bits: Int, f: Int): Int = {
    val o = dOff + f * block
    if (bits == 8) math.abs((bytes(o) & 0xff) - 128)
    else math.abs((bytes(o) & 0xff) | (bytes(o + 1).toInt << 8))
  }

  def decodeWav(bytes: Array[Byte], dim: Int): Option[(Double, Array[Float])] =
    parseWav(bytes).map { case (rate, block, bits, dOff, dLen) =>
      val nFrames = dLen / block
      val peaks = new Array[Float](dim)
      var f = 0
      while (f < nFrames) {
        val amp = frameAmp(bytes, dOff, block, bits, f)
        val seg = if (nFrames == 0) 0 else math.min(dim - 1, f.toLong * dim / nFrames).toInt
        if (amp > peaks(seg)) peaks(seg) = amp.toFloat
        f += 1
      }
      (nFrames.toDouble / rate, peaks)
    }

  /** JPEG/PNG/GIF/BMP magic bytes — the formats the in-JDK `javax.imageio`
    * readers handle without native libraries. Checked before handing the
    * payload to ImageIO so arbitrary binary junk never spins up a reader. */
  private def looksLikeImageIO(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) || // JPEG
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||  // PNG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // GIF
      (b(0) == 'B' && b(1) == 'M'))                                          // BMP

  /** A single-band raster whose samples really ARE intensities — i.e.
    * NOT palette-indexed: GIF always decodes to an IndexColorModel, as
    * do 8-bit BMP and paletted PNG, and there `getSample` returns the
    * color-table INDEX (index 0 can be white), not a gray level. */
  private def isTrueGray(img: java.awt.image.BufferedImage): Boolean =
    img.getRaster.getNumBands == 1 &&
      !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]

  /** Per-pixel integer intensity of a decoded image, chosen for oracle
    * exactness: TRUE single-band gray images ([[isTrueGray]]) read the
    * raster sample directly — NOT `getRGB`, whose gray→sRGB conversion
    * is gamma-corrected and would break bit-replay of a gray PNG
    * roundtrip — while multi-band AND palette-indexed images go through
    * the color model (`getRGB` resolves a palette index to its actual
    * color) and take the integer mean of R, G, B (alpha ignored). */
  private def intensityHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val raster = img.getRaster
    val trueGray = isTrueGray(img)
    val hist = new Array[Float](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val gray =
          if (trueGray) raster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          }
        hist(math.min(dim - 1, gray * dim / 256)) += 1f
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Real decoder: JPEG/PNG/GIF/BMP via the in-JDK `javax.imageio` —
    * magic-sniffed first, then fully decoded. Returns
    * `(width, height, intensity histogram)` shaped exactly like
    * [[decodePgm]] (bins over `[0, 255]`), so the two image arms are
    * interchangeable downstream. None on junk, truncated or unsupported
    * payloads (ImageIO returns null or throws → stub fallback). */
  def decodeImageIO(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] = {
    if (!looksLikeImageIO(bytes)) return None
    try {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, intensityHistogram(img, dim)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode an 8-bit grayscale raster as PNG (lossless — decode(encode(p))
    * returns exactly `p`, which is what lets a SQL oracle replay the
    * ImageIO path: it recomputes the histogram from the raster while the
    * engine recovers it from the encoded PNG). `pixels` must be `w*h`
    * gray bytes in row-major order. */
  def encodeGrayPng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h, s"raster must be w*h=${w * h} bytes, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new java.io.ByteArrayOutputStream(pixels.length / 2 + 64)
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode 8-bit unsigned mono PCM samples as a minimal RIFF/WAVE file
    * (PCM format tag 1, one channel, the exact container [[decodeWav]]
    * parses). Deterministic byte-for-byte, so an oracle can replay the
    * construction while the engine recovers duration and envelope
    * through the real chunk-walking decode. */
  def encodePcmWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + samples.length)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate) // byte rate = rate * block(1)
    bb.putShort(1) // block align
    bb.putShort(8) // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(samples.length)
    bb.put(samples)
    bb.array()
  }

  /** Real nearest-neighbor resample for ImageIO formats: decode, floor-NN
    * (the [[resizePgm]] kernel), re-encode as PNG — lossless regardless of
    * the input format, so resize(resize(x)) composes without generational
    * quality loss. Gray stays single-band; everything else lands in RGB. */
  def resizeImageIO(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    if (!looksLikeImageIO(bytes)) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      // palette-indexed single-band images (GIF, 8-bit BMP, paletted
      // PNG) must go through the RGB path — their samples are color
      // table indices, not gray levels (see isTrueGray)
      val isGray = isTrueGray(img)
      val out = new java.awt.image.BufferedImage(targetW, targetH,
        if (isGray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        val sy = (y.toLong * img.getHeight / targetH).toInt
        var x = 0
        while (x < targetW) {
          val sx = (x.toLong * img.getWidth / targetW).toInt
          if (isGray)
            out.getRaster.setSample(x, y, 0, img.getRaster.getSample(sx, sy, 0))
          else out.setRGB(x, y, img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(targetW * targetH / 2 + 64)
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Codec dispatch: real decode when the payload IS a supported public
    * format (validated, not just sniffed), [[decodeStub]] otherwise.
    * Dispatch is gated on the declared `kind`: an 'audio' row whose
    * payload happens to parse as an image keeps its audio feature shape
    * (stub) instead of silently switching category — the declared type,
    * not byte luck, decides which decoders are even attempted. */
  def decodeMedia(kind: String, content: Array[Byte], dim: Int): (Option[Int], Option[Int], Option[Double], Array[Float]) = {
    val real: Option[(Option[Int], Option[Int], Option[Double], Array[Float])] = kind match {
      case "image" =>
        decodePgm(content, dim).map { case (w, h, f) => (Some(w), Some(h), None, f) }
          .orElse(decodeImageIO(content, dim).map { case (w, h, f) => (Some(w), Some(h), None, f) })
      case "audio" | "video" =>
        decodeWav(content, dim).map { case (d, f) => (None, None, Some(d), f) }
      case _ => None
    }
    real.getOrElse(decodeStub(kind, content, dim))
  }

  /** Distributed decode/feature-extract: one streamed pass per partition.
    * Null payloads produce a feature row with empty features (kept, so
    * joins stay total). `codec` defaults to the real-first dispatch
    * ([[decodeMedia]]); pass [[decodeStub]] to pin the deterministic
    * stub regardless of payload content — a pipeline whose oracle
    * replays the stub must not silently flip to a real decode when a
    * payload happens to parse as netpbm/WAV. */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      codec: (String, Array[Byte], Int) => (Option[Int], Option[Int], Option[Double], Array[Float]) = decodeMedia): DataFrame = {
    val spark = media.sparkSession
    val encoder = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val (w, h, d, f) = codec(kind, content, dim)
        Row(id, kind, (if (content == null) 0 else content.length).toLong,
          w.orNull, h.orNull, d.orNull, f)
      }
    }(encoder)
  }

  /** Resize for images: per-item transform producing a new payload +
    * target dimensions, streamed per partition like [[extractFeatures]].
    * A payload that parses as binary netpbm gets the REAL
    * nearest-neighbor resample ([[resizePgm]] — actual pixels move);
    * any other payload falls back to the deterministic stub truncation
    * (first `min(n, targetW*targetH)` bytes), so the op stays total on
    * mixed/opaque media and a deployment swaps richer codecs in at the
    * same seam as [[decodeMedia]]. Non-image rows pass through untouched
    * with null target dims — resize composes with mixed-kind media
    * tables. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (kind != "image" || content == null) Row(id, kind, content, null, null)
        else Row(id, kind,
          resizePgm(content, targetW, targetH)
            .orElse(resizeImageIO(content, targetW, targetH))
            .getOrElse(content.take(math.min(content.length, targetW * targetH))),
          targetW, targetH)
      }
    }(encoder)
  }

  /** dHash core: NN-sample the intensity plane onto an 11×6 grid and
    * emit the 60-bit horizontal-gradient fingerprint — bit `y·10 + x`
    * set iff I(x+1, y) > I(x, y) on the grid (`x < 10`). The NN kernel
    * is exactly [[resizePgm]]'s (`src = ⌊target·size/targetSize⌋`), so
    * hashing the original equals hashing its 11×6 resize. */
  private def dHashFromIntensity(w: Int, h: Int, intensity: (Int, Int) => Int): Long = {
    var sh = 0L
    var y = 0
    while (y < 6) {
      val sy = (y.toLong * h / 6).toInt
      var x = 0
      while (x < 10) {
        val sxa = (x.toLong * w / 11).toInt
        val sxb = ((x + 1).toLong * w / 11).toInt
        if (intensity(sxb, sy) > intensity(sxa, sy)) sh |= 1L << (y * 10 + x)
        x += 1
      }
      y += 1
    }
    sh
  }

  /** 60-bit perceptual difference hash (dHash) of an image payload via
    * the REAL decode paths: binary netpbm (P5 intensities directly; P6
    * integer-mean RGB — [[intensityHistogram]]'s rule) or any
    * `javax.imageio` container (true-gray rasters read the band sample,
    * palette/color images take the integer RGB mean). None for payloads
    * neither decoder accepts — dHash is a CONTENT hash, so there is
    * deliberately no stub fallback (a byte-hash of an opaque payload
    * would alias unrelated media into Hamming-0 pairs). Gradient bits
    * survive brightness shifts and re-encoding; 60 bits feed the
    * [[graft.dedup.Dedup.hammingPairs]] pigeonhole family directly. */
  /** Shared decode for the dHash family: `(width, height, intensity)`
    * through the REAL paths — binary netpbm (P5 intensities directly;
    * P6 integer-mean RGB, [[intensityHistogram]]'s rule) or any
    * `javax.imageio` container (true-gray band sample, else integer RGB
    * mean). None for payloads neither decoder accepts. */
  private def intensityAccessor(bytes: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] = {
    parseNetpbm(bytes) match {
      case Some((channels, w, h, _, off)) =>
        val intensity: (Int, Int) => Int =
          if (channels == 1) (x, y) => bytes(off + y * w + x) & 0xff
          else (x, y) => {
            val p = off + (y * w + x) * 3
            ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)) / 3
          }
        return Some((w, h, intensity))
      case None =>
    }
    if (!looksLikeImageIO(bytes)) return None
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val raster = img.getRaster
      val intensity: (Int, Int) => Int =
        if (isTrueGray(img)) (x, y) => raster.getSample(x, y, 0)
        else (x, y) => {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        }
      Some((img.getWidth, img.getHeight, intensity))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def dHash60(bytes: Array[Byte]): Option[java.lang.Long] =
    intensityAccessor(bytes).map { case (w, h, i) =>
      java.lang.Long.valueOf(dHashFromIntensity(w, h, i))
    }

  /** The VERTICAL-gradient word of the wide dHash: bit `y·10 + x` set
    * iff I(x, y+1) > I(x, y) on a 10×7 NN grid (10 columns, 7 rows → 60
    * comparisons) — the second plane [[dHash120]] pairs with the
    * horizontal word. Same NN kernel family as [[dHashFromIntensity]]. */
  private def dHashVerticalFromIntensity(w: Int, h: Int, intensity: (Int, Int) => Int): Long = {
    var sh = 0L
    var y = 0
    while (y < 6) {
      val sya = (y.toLong * h / 7).toInt
      val syb = ((y + 1).toLong * h / 7).toInt
      var x = 0
      while (x < 10) {
        val sx = (x.toLong * w / 10).toInt
        if (intensity(sx, syb) > intensity(sx, sya)) sh |= 1L << (y * 10 + x)
        x += 1
      }
      y += 1
    }
    sh
  }

  /** 120-bit wide dHash: `[horizontal word, vertical word]` from ONE
    * decode — the block-width cure for the perceptual pair family (the
    * same move [[graft.dedup.Dedup.simhashPairsWide]] made for text):
    * at maxHamming 6 the 60-bit family blocks on ~8.6-bit keys
    * (candidates ∝ N²/2^8.6 per block — fine to the measured 64×/320 k,
    * saturating ~10⁶ media), while 120 bits give ~17-bit blocks — 2^8.5×
    * fewer collisions — through the SAME pigeonhole core
    * ([[graft.dedup.Dedup.hammingPairsWide]]). The vertical plane adds
    * independent gradient evidence, so the wider hash also separates
    * better, not just blocks better. */
  def dHash120(bytes: Array[Byte]): Option[Array[Long]] =
    intensityAccessor(bytes).map { case (w, h, i) =>
      Array(dHashFromIntensity(w, h, i), dHashVerticalFromIntensity(w, h, i))
    }

  /** 60-bit perceptual hash of an audio payload: the REAL RIFF/WAVE
    * decode ([[parseWav]]) reduces channel 0 to a 60-segment integer
    * ENERGY envelope (sum of |amplitude| per segment — exact for both
    * PCM widths), and bit `j` is set iff segment `j` carries more than
    * the mean energy (`60·e(j) > Σe`, pure integer comparison, so the
    * fingerprint replays in SQL from the raw samples — q93's oracle).
    * The mean-crossing form makes the hash EXACTLY invariant under any
    * uniform gain scaling and robust to re-encoding/requantization
    * (integer rounding can flip only segments already sitting at the
    * mean) — the actual audio near-dup case, where the same recording
    * circulates at different levels. Position-aligned by construction:
    * like every time-domain fingerprint it does not match time-shifted
    * or time-warped copies. None for anything [[decodeWav]] refuses. */
  def audioHash60(bytes: Array[Byte]): Option[java.lang.Long] =
    parseWav(bytes).map { case (_, block, bits, dOff, dLen) =>
      val nFrames = dLen / block
      val e = new Array[Long](60)
      var f = 0
      while (f < nFrames) {
        val seg = if (nFrames == 0) 0 else math.min(59, f.toLong * 60 / nFrames).toInt
        e(seg) += frameAmp(bytes, dOff, block, bits, f)
        f += 1
      }
      val total = e.sum
      var sh = 0L
      var j = 0
      while (j < 60) {
        if (60L * e(j) > total) sh |= 1L << j
        j += 1
      }
      java.lang.Long.valueOf(sh)
    }

  /** [[audioHash60]] with coarse ONSET ALIGNMENT — the time-warp-tolerant
    * variant a real corpus needs, where the same recording circulates
    * with trimmed or padded edges (encoder priming, silence trims): the
    * position-aligned envelope shifts every segment on a 1-frame pad and
    * the fingerprints diverge. Here the segmenting window is the ACTIVE
    * region — first through last frame whose amplitude clears 1/20 of
    * the payload's peak (`20·a > peak`, pure integer, gain-invariant
    * since both sides scale) — so leading/trailing near-silence of ANY
    * length drops out before the 60-segment envelope and a silence-
    * padded copy hashes identically. All-silent payloads (peak 0, or no
    * frame above threshold) hash to 0. Mid-stream warps still break it —
    * that's the shingled-sub-fingerprint tier, not this one; edge trims
    * are the overwhelmingly common case. */
  def audioHashAligned60(bytes: Array[Byte]): Option[java.lang.Long] =
    parseWav(bytes).map { case (_, block, bits, dOff, dLen) =>
      val nFrames = dLen / block
      val amps = new Array[Long](nFrames)
      var peak = 0L
      var f = 0
      while (f < nFrames) {
        val a = frameAmp(bytes, dOff, block, bits, f)
        amps(f) = a; if (a > peak) peak = a; f += 1
      }
      var on = 0
      while (on < nFrames && 20L * amps(on) <= peak) on += 1
      if (on == nFrames) java.lang.Long.valueOf(0L) // all silence
      else {
        var off = nFrames - 1
        while (off > on && 20L * amps(off) <= peak) off -= 1
        val la = off - on + 1
        val e = new Array[Long](60)
        var i = 0
        while (i < la) {
          e((i.toLong * 60 / la).toInt) += amps(on + i); i += 1
        }
        val total = e.sum
        var sh = 0L
        var j = 0
        while (j < 60) {
          if (60L * e(j) > total) sh |= 1L << j
          j += 1
        }
        java.lang.Long.valueOf(sh)
      }
    }

  /** One streamed fingerprint pass: `(media_id, phash)`, null for rows
    * of the wrong kind or whose payload the kernel refuses. */
  private def perceptualSignatures(media: DataFrame, kind: String,
      kernel: Array[Byte] => Option[java.lang.Long]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val sh = if (r.getString(1) != kind || content == null) null
          else kernel(content).orNull
        Row(r.getLong(0), sh)
      }
    }(encoder)
  }

  /** Distributed dHash pass: `(media_id, phash)`, null for rows whose
    * payload no real image decoder accepts (non-image kinds, junk
    * bytes). Streamed per partition like [[extractFeatures]] — pair
    * with [[repartitionForDecode]] when payload sizes are skewed. */
  def dHashSignatures(media: DataFrame): DataFrame =
    perceptualSignatures(media, "image", dHash60 _)

  /** [[dHashSignatures]]' wide twin: `(media_id, phash: array<bigint>)`
    * over [[dHash120]] — one decode, two gradient words. */
  def dHashWideSignatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", ArrayType(LongType), nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val sh = if (r.getString(1) != "image" || content == null) null
          else dHash120(content).orNull
        Row(r.getLong(0), sh)
      }
    }(encoder)
  }

  /** [[dHashPairs]] at 120 bits — the >10⁶-media scale path: wide
    * fingerprints through [[graft.dedup.Dedup.hammingPairsWide]]'s
    * ~17-bit pigeonhole blocks (2^8.5× fewer blocking collisions than
    * the 60-bit family at the same perfect-recall guarantee). */
  def dHashWidePairs(media: DataFrame, maxHamming: Int = 6): DataFrame =
    graft.dedup.Dedup.hammingPairsWide(
      dHashWideSignatures(media).filter(col("phash").isNotNull)
        .select(col("media_id").as("id"), col("phash").as("sh")),
      bits = 120, maxHamming = maxHamming)

  /** [[dHashSignatures]]' audio twin over [[audioHash60]]. */
  def audioHashSignatures(media: DataFrame): DataFrame =
    perceptualSignatures(media, "audio", audioHash60 _)

  private def perceptualPairs(sigs: DataFrame, maxHamming: Int): DataFrame =
    graft.dedup.Dedup.hammingPairs(
      sigs.filter(col("phash").isNotNull)
        .select(col("media_id").as("id"), col("phash").as("sh")),
      bits = 60, maxHamming = maxHamming)

  /** Corpus size past which the adaptive [[dHashPairs]] default takes
    * the 120-bit wide path: the 60-bit family's ~8.6-bit blocks were
    * measured fine to 320 k media (SCALE.md 64× perceptual probe) and
    * saturate near 10⁶, so the cutover sits between — after the
    * measured-safe point, comfortably before the ceiling. */
  val DHashWideCutover: Long = 1L << 19 // 524 k media

  /** Image near-duplicate pairs: dHash fingerprints into the pigeonhole
    * Hamming-blocking join ([[graft.dedup.Dedup.hammingPairs]] —
    * `maxHamming + 1` blocks, perfect recall, candidates ≈ true pairs
    * while the corpus stays under the block-width ceiling). Undecodable
    * rows drop out before the join (their nulls would otherwise
    * Hamming-match each other). Output `(id_a, id_b, hamming)` — the
    * multimodal twin of text [[graft.dedup.Dedup.simhashPairs]], one
    * decode pass + one blocked self-join at any corpus size.
    *
    * `bits` picks the fingerprint family — 60 (one gradient word) or
    * 120 ([[dHashWidePairs]], the >10⁶-media block-width cure); the
    * DEFAULT is corpus-size-adaptive (VERDICT r12 #4): past
    * [[DHashWideCutover]] media the no-knobs call takes the wide path,
    * so the 100 TB default is the scale-safe one. Oracle-pinned callers
    * pass `bits = 60` explicitly. Adaptive costs one `count()` job. */
  def dHashPairs(media: DataFrame, maxHamming: Int = 6,
      bits: Int = graft.dedup.Dedup.AdaptiveBits): DataFrame = {
    val b =
      if (bits == graft.dedup.Dedup.AdaptiveBits)
        (if (media.count() > DHashWideCutover) 120 else 60)
      else bits
    require(b == 60 || b == 120,
      s"dHash has two native widths, 60 and 120 bits; got $b")
    if (b == 120) dHashWidePairs(media, maxHamming)
    else perceptualPairs(dHashSignatures(media), maxHamming)
  }

  /** Audio near-duplicate pairs — [[dHashPairs]] over the envelope
    * fingerprint; same blocking core, same output schema. */
  def audioHashPairs(media: DataFrame, maxHamming: Int = 6): DataFrame =
    perceptualPairs(audioHashSignatures(media), maxHamming)

  /** [[audioHashSignatures]]' onset-aligned twin over
    * [[audioHashAligned60]]. */
  def audioAlignedSignatures(media: DataFrame): DataFrame =
    perceptualSignatures(media, "audio", audioHashAligned60 _)

  /** Trim-tolerant audio near-duplicate pairs — [[audioHashPairs]] with
    * onset alignment, so silence-trimmed/padded copies land at hamming 0
    * instead of missing entirely. Same pigeonhole blocking core. */
  def audioAlignedPairs(media: DataFrame, maxHamming: Int = 6): DataFrame =
    perceptualPairs(audioAlignedSignatures(media), maxHamming)

  /** Frame-sampling plumbing for video: emit one row per sampled frame
    * index (the decode itself is the stub). Generator-only — no shuffle. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest((length(col("content")) / 1000).cast(IntegerType), lit(1)))
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(everyNth)), 1, maxFrames)))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("meta"))

  /** Spread media rows evenly before the expensive decode: hash-partition
    * on id so one oversized input file can't pin a single task, sized so
    * `targetBytesPerPartition` of payload lands in each task. */
  def repartitionForDecode(media: DataFrame, totalBytes: Long,
      targetBytesPerPartition: Long = 512L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }
  /** Split a concatenated multi-frame netpbm container into its frames.
    * Each frame is self-describing (the P5/P6 header carries w, h,
    * maxval, so the raster length is known without decoding pixels) —
    * the "video" contract this engine uses for frame streams: an opaque
    * binary column whose frames parse independently. Walking the
    * container costs header parsing per frame; pixels are only touched
    * by whatever the caller runs on the frames it KEEPS — that split is
    * what makes frame SAMPLING a real saving. Stops at the first byte
    * run that is not a complete frame (trailing garbage is ignored,
    * loudly absent rather than mis-decoded). */
  def splitFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    var ok = bytes != null
    while (ok && off < bytes.length) {
      // header parsed AT the offset — only the frame's exact [off, end)
      // range is ever copied, so the walk is O(container bytes), not
      // O(frames x container bytes) (ADVICE r15)
      parseNetpbm(bytes, off) match {
        case Some((ch, w, h, _, rOff)) =>
          val end = off + rOff + w * h * ch
          out += java.util.Arrays.copyOfRange(bytes, off, end)
          off = end
        case None => ok = false
      }
    }
    out.toSeq
  }

  /** Frame-sample a video column and fingerprint the KEPT frames: one
    * row per sampled frame (every `everyN`-th, starting at 0) with its
    * 60-bit dHash. One partition-local decode pass — frames that the
    * sampler skips never reach the pixel walk, so decode work scales
    * with frames/everyN, not frames (the mapInPandas batch shape of the
    * image/audio families, applied to frame streams). */
  def videoFrameHashes(media: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.flatMap { r =>
        val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        splitFrames(content).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 =>
            Row(r.getLong(0), idx, dHash60(frame).orNull)
        }
      }
    }(encoder)
  }

  /** Shot-boundary detection over sampled frames: a cut is a sampled
    * frame whose dHash sits more than `cutHamming` bits from the
    * PREVIOUS sampled frame — scene segmentation for video training
    * data, the temporal cousin of [[dHashPairs]]' spatial dedup. The
    * window partitions by video and orders by frame index: state is one
    * video's sampled-frame count, never the corpus. First sampled frame
    * has no predecessor → hamming_prev/is_cut are NULL (unknowable, not
    * false). */
  def shotBoundaries(media: DataFrame, everyN: Int, cutHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    videoFrameHashes(media, everyN)
      .withColumn("prev", lag(col("dhash"), 1).over(w))
      .select(col("media_id"), col("frame_idx"), col("dhash"),
        bit_count(col("dhash").bitwiseXOR(col("prev"))).cast("int").as("hamming_prev"),
        (bit_count(col("dhash").bitwiseXOR(col("prev"))) > cutHamming).as("is_cut"))
  }
}
