package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata, exactly like a
  * training-data pipeline carries them at 100 TB (the bytes shuffle as
  * one column; Catalyst prunes them away from any query that does not
  * touch them).
  *
  * IMAGE decode is REAL: `decodeImageMeta` reads width/height/channels
  * from the actual bytes via the JDK's own ImageIO (PNG/JPEG/GIF/BMP).
  * Only the deep featurize/resize/frame-extract steps are stubbed
  * (`decodeImageFeaturesStub`, `resizeStub`, `frameSampleStub` — this
  * container has no vision/audio model libraries): they keep the exact
  * mapPartitions / Column batch shape a real decoder plugs into, so
  * swapping a stub body for a JNI/library call is a one-function change.
  */
object MultimodalFunctions {

  // ImageIO defaults to DISK-backed stream caches: every read()/write()
  // wraps the stream in a FileCacheImageInput/OutputStream that CREATES
  // AND DELETES a temp file under java.io.tmpdir — per image. At sf
  // scales that is invisible; at the 100× sweep (2M docs × 5 bench
  // iterations of the media family) the whole machine went
  // syscall-bound: a thread-stack sample showed 18 of 32 executor
  // threads inside File.delete and 13 inside UnixNativeDispatcher.open
  // (SCALING.md r14 §5). Our payloads are byte arrays already in
  // memory, so memory-backed caches are strictly better at any scale.
  // Class-load-time, once per JVM (executors load this object before
  // any decode lambda runs).
  //
  // USER-FACING CAVEAT: setUseCache is a PROCESS-GLOBAL JVM switch,
  // re-asserted per partition below — co-resident user code doing its
  // own ImageIO work in the same executors inherits memory-backed
  // stream caches too. That only matters for decoding images too large
  // for heap from disk/network streams (the disk cache exists to bound
  // heap); this engine's payloads are in-memory byte arrays. A user
  // who needs disk-backed caches in a shared executor JVM should set
  // setUseCache(true) immediately before their own reads — the engine
  // re-asserts false whenever one of its media helpers runs a
  // partition, so a one-time opt-in elsewhere does not stick.
  private val _memCachedImageIo: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte MIME sniffing over the first bytes of a binary column
    * (JPEG/PNG/GIF/RIFF-WAV/PDF; everything else is octet-stream). */
  def sniffMime(bin: Column): Column = {
    val prefix = hex(substring(bin, 1, 8))
    when(prefix.startsWith("FFD8FF"), "image/jpeg")
      .when(prefix.startsWith("89504E47"), "image/png")
      .when(prefix.startsWith("47494638"), "image/gif")
      .when(prefix.startsWith("52494646"), "audio/wav")
      .when(prefix.startsWith("25504446"), "application/pdf")
      .otherwise("application/octet-stream")
  }

  /** Attach the standard media-metadata columns: byte size and sniffed
    * MIME. Pure projection — stays in whole-stage codegen. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_bytes", octet_length(col(binCol)))
      .withColumn("media_mime", sniffMime(col(binCol)))

  /** Deterministic STUB feature extraction over binary media via
    * `mapPartitions` — the Scala analogue of a Pandas-UDF batch decode:
    * one iterator per partition, library/model handles would be opened
    * once per partition here, rows stream through in batches.
    *
    * STUB SEMANTICS: features are a byte-histogram sketch (dim buckets,
    * L1-normalized) — NOT a real decode. Replace the body of
    * `fakeDecode` with the real library call when one is available. */
  def decodeImageFeaturesStub(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      // per-partition init would go here (decoder handles, model load)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else fakeDecode(bytes, dim).toSeq))
      }
    }(enc)
  }

  /** REAL image decode via the JDK's ImageIO in `mapPartitions`:
    * width / height / channel count read from the ACTUAL bytes for the
    * formats the JDK ships decoders for (PNG, JPEG, GIF, BMP); null
    * metadata for payloads ImageIO cannot decode (other media, junk).
    * Same batch shape as `decodeImageFeaturesStub` — one iterator per
    * partition, rows stream through — so swapping in a heavier decoder
    * (JNI codec, model featurizer) changes only the per-row body. No
    * external libraries: `javax.imageio` is part of the JDK, so this
    * path is real, not a stub, everywhere the engine runs. */
  def decodeImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_channels", IntegerType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta: Seq[Any] =
          if (bytes == null) Seq(null, null, null)
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) Seq(null, null, null)
            else Seq(img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
          } catch { case _: java.io.IOException => Seq(null, null, null) }
        Row.fromSeq(r.toSeq ++ meta)
      }
    }(enc)
  }

  /** REAL audio metadata decode: walk a RIFF/WAVE container's chunk
    * list from the actual bytes — `fmt ` yields channels / sample rate /
    * bits per sample, `data` yields the payload size, and duration
    * follows as dataBytes * 1000 / byteRate. Pure-JVM byte parsing (no
    * libraries), so like `decodeImageMeta` this path is real everywhere
    * the engine runs; non-WAV or truncated payloads yield null metadata.
    * Same mapPartitions batch shape as the other decoders. */
  def decodeWavMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("wav_sample_rate", IntegerType, nullable = true),
      StructField("wav_channels", IntegerType, nullable = true),
      StructField("wav_bits", IntegerType, nullable = true),
      StructField("wav_duration_ms", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq ++ parseWav(bytes))
      }
    }(enc)
  }

  /** REAL PCM feature extraction: locate the RIFF `data` chunk, decode
    * its 16-bit little-endian samples, and reduce them in one pass to
    * exact integer features — sample count, energy (Σ v², exact in a
    * long), peak |v|, and zero crossings (sign flips, zero counted as
    * non-negative). Integer outputs make the features bit-portable:
    * an oracle that knows the intended samples can recompute them in
    * closed form, proving the byte-level decode reconstructed exactly
    * the intended signal. Channels are scanned interleaved as one
    * stream (documented; per-channel split is a groupBy away). */
  def decodePcmFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_samples", IntegerType, nullable = true),
      StructField("sum_sq", LongType, nullable = true),
      StructField("peak", IntegerType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        Row.fromSeq(r.toSeq ++ pcmFeatures(r.getAs[Array[Byte]](binIdx)))
      }
    }(enc)
  }

  private def pcmFeatures(bytes: Array[Byte]): Seq[Any] = {
    val none = Seq[Any](null, null, null, null)
    val span = wavDataSpan(bytes)
    if (span == null) none
    else {
      val (off, len) = span
      val n = len / 2
      var i = 0
      var sumSq = 0L; var peak = 0; var zc = 0L
      var prevNonNeg = true
      while (i < n) {
        val lo = bytes(off + 2 * i) & 0xff
        val hi = bytes(off + 2 * i + 1)
        val v = (hi << 8) | lo // sign-extends through hi
        sumSq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        val nonNeg = v >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        i += 1
      }
      Seq[Any](n, sumSq, peak, zc)
    }
  }

  /** (offset, length) of the `data` chunk payload, or null. */
  private def wavDataSpan(bytes: Array[Byte]): (Int, Int) = {
    def u32(o: Int) = ((bytes(o) & 0xff).toLong | ((bytes(o + 1) & 0xff).toLong << 8) |
      ((bytes(o + 2) & 0xff).toLong << 16) | ((bytes(o + 3) & 0xff).toLong << 24))
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes == null || bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(off); val sz = u32(off + 4)
      if (id == "data")
        return (off + 8, math.min(sz, (bytes.length - off - 8).toLong).toInt)
      // advance in Long space: a crafted u32 size (e.g. 0xFFFFFFF8)
      // truncated via .toInt wraps negative and stalls off in place —
      // an executor task spinning forever on one adversarial row. In
      // Long math off strictly increases, so an oversized chunk just
      // walks past the end and the loop bound terminates.
      val next = off.toLong + 8L + sz + (sz & 1L)
      if (next > bytes.length.toLong) return null
      off = next.toInt
    }
    null
  }

  /** REAL multi-frame decode on the JDK codec path: read every frame
    * of an animated GIF (the one multi-frame container the JDK ships a
    * codec for) and emit ONE ROW PER FRAME with its dimensions and an
    * exact integer feature (mean of the red channel, integer-divided) —
    * the genuine one-row-in/n-frames-out batch shape the
    * `frameSampleStub` only plumbs. Undecodable/non-GIF payloads emit
    * zero rows (frame extraction is a generator, not a projection).
    * Scale shape: mapPartitions flatMap — fan-out happens executor-side
    * with no shuffle; downstream keying decides the exchange. */
  def decodeGifFrames(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_width", IntegerType, nullable = false),
      StructField("frame_height", IntegerType, nullable = false),
      StructField("frame_mean_red", IntegerType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else try {
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n).iterator.map { i =>
              val img = reader.read(i)
              val (w, h) = (img.getWidth, img.getHeight)
              var sumRed = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sumRed += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
                y += 1
              }
              Row.fromSeq(r.toSeq ++ Seq(i, w, h, (sumRed / (w.toLong * h)).toInt))
            }.toVector
          } finally { reader.dispose(); iis.close() }
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }

  private def parseWav(bytes: Array[Byte]): Seq[Any] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = ((bytes(o) & 0xff).toLong | ((bytes(o + 1) & 0xff).toLong << 8) |
      ((bytes(o + 2) & 0xff).toLong << 16) | ((bytes(o + 3) & 0xff).toLong << 24))
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    val none = Seq[Any](null, null, null, null)
    if (bytes == null || bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") none
    else {
      var off = 12
      var rate, ch, bits = -1; var byteRate = -1L; var dataLen = -1L
      while (off + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
        val id = tag(off); val sz = u32(off + 4)
        if (id == "fmt " && off + 24 <= bytes.length) {
          ch = u16(off + 10); rate = u32(off + 12).toInt
          byteRate = u32(off + 16); bits = u16(off + 22)
        } else if (id == "data") {
          // size may legally exceed the remaining bytes only in
          // streaming writers; clamp to what is actually present
          dataLen = math.min(sz, (bytes.length - off - 8).toLong)
        }
        // word-aligned advance in Long space — same wrap guard as
        // wavDataSpan: a u32 size >= 2^31 truncated to Int goes
        // negative and pins off forever. Long math keeps off strictly
        // increasing; an oversized chunk exits via the loop bound.
        val next = off.toLong + 8L + sz + (sz & 1L)
        if (next > bytes.length.toLong) off = bytes.length
        else off = next.toInt
      }
      if (rate <= 0 || byteRate <= 0 || dataLen < 0) none
      // Seq[Any] ascription: without it Scala widens the Int fields to
      // Long to unify with the duration, breaking the Row's INT columns
      else Seq[Any](rate, ch, bits, dataLen * 1000L / byteRate)
    }
  }

  /** The stub body: byte-value histogram, L1-normalized. Deterministic
    * in the input bytes, so tests and reruns agree. */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Double] = {
    val hist = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % dim) += 1.0
      i += 1
    }
    val total = math.max(1.0, bytes.length.toDouble)
    hist.map(_ / total)
  }

  /** REAL image resize: decode via ImageIO, scale with Graphics2D
    * (bilinear), re-encode as PNG — all JDK, so this path is real
    * everywhere the engine runs. Payloads ImageIO cannot decode come
    * back null (resize of junk is undefined, not identity). Same
    * mapPartitions batch shape as the other decoders. */
  def resizeImage(df: DataFrame, binCol: String, width: Int, height: Int,
                  outCol: String = "resized"): DataFrame = {
    require(width > 0 && height > 0, "resizeImage: positive target dims")
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out: Any =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val scaled = new java.awt.image.BufferedImage(
                width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(scaled, "png", bos)
              bos.toByteArray
            }
          } catch { case _: java.io.IOException => null }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** REAL image features: L1-normalized luminance histogram over the
    * DECODED pixels (Rec.601 luma), not the encoded bytes — the honest
    * classical-CV feature the byte-histogram stub stands in for on
    * non-image media. Null for undecodable payloads. */
  def imageLumaHistogram(df: DataFrame, binCol: String, bins: Int = 16,
                         outCol: String = "luma_hist"): DataFrame = {
    require(bins > 0, "imageLumaHistogram: positive bins")
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType, containsNull = false), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out: Any =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val hist = new Array[Double](bins)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  val luma = (299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  hist(luma * bins / 256) += 1.0
                  x += 1
                }
                y += 1
              }
              val total = img.getWidth.toDouble * img.getHeight
              hist.map(_ / total).toSeq
            }
          } catch { case _: java.io.IOException => null }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** REAL perceptual difference-hash (dHash) over the DECODED pixels of
    * a 9×8 image: bit `y*8+x` is set when the integer luma of pixel
    * (x+1,y) strictly exceeds that of (x,y) (unscaled Rec.601 weights
    * 299/587/114 — order-identical to the scaled luma, exact in int
    * math). Emitted as a 16-hex-char lowercase string: one byte per row
    * y=0..7, bit x as the 2^x place. Inputs are expected pre-resized to
    * 9×8 (compose with `resizeImage(df, col, 9, 8)` — the canonical
    * dHash pipeline); other dimensions, null, or undecodable payloads
    * hash to null rather than a misleading value.
    *
    * Same-hash grouping is the standard image-dedup primitive: the hash
    * is 16 bytes per image however large the pixels, so the dedup
    * becomes an ordinary hash-partition groupBy at any corpus scale —
    * the decoded pixels never shuffle. */
  def imageDHash(df: DataFrame, binCol: String, outCol: String = "dhash"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, StringType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition, executor-side: see _memCachedImageIo — the
      // closure may deserialize on an executor JVM that never touched
      // this object, so the no-disk-cache switch is re-asserted here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out: Any =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth != 9 || img.getHeight != 8) null
            else {
              def luma(x: Int, y: Int): Int = {
                val rgb = img.getRGB(x, y)
                299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              }
              val sb = new java.lang.StringBuilder(16)
              var y = 0
              while (y < 8) {
                var rowByte = 0
                var x = 0
                while (x < 8) {
                  if (luma(x + 1, y) > luma(x, y)) rowByte |= (1 << x)
                  x += 1
                }
                sb.append(f"$rowByte%02x")
                y += 1
              }
              sb.toString
            }
          } catch { case _: java.io.IOException => null }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** STUB resize: deterministic downsample of the payload to `target`
    * bytes by strided selection — stands in for an image resize (the
    * real one swaps the lambda body for a decoder+scaler call). Pure
    * Column expression: binary in, binary out, codegen-friendly slicing.
    * Payloads shorter than `target` pass through unchanged. */
  def resizeStub(bin: Column, target: Int): Column = {
    require(target > 0, "resizeStub: target must be positive")
    // stride = ceil(len/target); take every stride-th byte
    val len = octet_length(bin)
    val stride = ceil(len.cast("double") / target).cast("int")
    when(bin.isNull, lit(null).cast("binary"))
      .when(len <= target, bin)
      .otherwise(concat((0 until target).map(i =>
        bin.substr(lit(i) * stride + 1, lit(1))): _*))
  }

  /** STUB frame sampling: `n` evenly spaced fixed-width byte windows of
    * a (video/audio) payload as an array<binary> — the batch shape a
    * real frame extractor produces (one row in, n frames out via
    * explode). Windows start at floor(k * len / n). */
  def frameSampleStub(bin: Column, n: Int, frameBytes: Int): Column = {
    require(n > 0 && frameBytes > 0, "frameSampleStub: positive n and frameBytes")
    val len = octet_length(bin)
    when(bin.isNull, lit(null).cast("array<binary>"))
      .otherwise(transform(sequence(lit(0), lit(n - 1)),
        k => bin.substr((floor(k.cast("double") * len / n) + 1).cast("int"), lit(frameBytes))))
  }
}
