package graft

import graft.functions.MultimodalFunctions
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: MIME sniffing, metadata
  * projection, and the mapPartitions decode-stub batch shape. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media = Seq(
    (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3)),
    (2L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 9)),
    (3L, Array[Byte](0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0)),
    (4L, "plain text".getBytes("UTF-8")),
    (5L, null.asInstanceOf[Array[Byte]])
  ).toDF("id", "media")

  test("sniffMime recognizes jpeg/png/wav and falls back to octet-stream") {
    val got = MultimodalFunctions.withMediaMeta(media, "media")
      .select("id", "media_mime").orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "image/jpeg")
    assert(got(2L) == "image/png")
    assert(got(3L) == "audio/wav")
    assert(got(4L) == "application/octet-stream")
  }

  test("withMediaMeta reports exact byte sizes and prunes away unused bytes") {
    val df = MultimodalFunctions.withMediaMeta(media, "media")
    val sizes = df.select("id", "media_bytes").orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(sizes(1L) == 7 && sizes(2L) == 9 && sizes(5L) == -1)
    // a query not touching `media` must not read it: check the scan's
    // pruned schema via the analyzed plan's output of the projection
    val pruned = df.select("id", "media_mime").queryExecution.optimizedPlan
    assert(!pruned.schema.fieldNames.contains("media"))
  }

  test("imageDHash: gradient direction sets bits; dup images collide; bad input is null") {
    def png(w: Int, h: Int, luma: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val l = luma(x); img.setRGB(x, y, (l << 16) | (l << 8) | l)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rising  = png(9, 8, x => x * 20)       // every adjacent pair increases
    val falling = png(9, 8, x => 200 - x * 20) // never increases
    val df = Seq(
      (1L, rising), (2L, falling), (3L, rising),              // 3 dups 1
      (4L, png(4, 4, _ => 7)),                                // wrong dims
      (5L, "not an image".getBytes("UTF-8")),                 // undecodable
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "img")
    val got = MultimodalFunctions.imageDHash(df, "img")
      .select("id", "dhash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "ffffffffffffffff")
    assert(got(2L) == "0000000000000000")
    assert(got(3L) == got(1L))
    assert(got(4L) == null && got(5L) == null && got(6L) == null)
  }

  test("imageDHash survives the png encode->resize->decode codec chain") {
    // the media_phash_dedup pipeline: synthesize, real resize (identity
    // at 9x8), hash — two docs in the same residue class must collide,
    // different classes with different luma patterns must not
    def synth(g: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 9; y <- 0 until 8) {
        val l = ((g + 3) * (x + 1) * 19 + x * x * 11) % 256
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((0L, synth(0)), (24L, synth(0)), (1L, synth(1)))
      .toDF("id", "img")
    val resized = MultimodalFunctions.resizeImage(df, "img", 9, 8)
      .drop("img").withColumnRenamed("resized", "img")
    val got = MultimodalFunctions.imageDHash(resized, "img")
      .select("id", "dhash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == got(24L))
    assert(got(0L) != got(1L))
    assert(got(0L).matches("[0-9a-f]{16}"))
  }

  test("decodeImageFeaturesStub emits a normalized feature vector per row") {
    val out = MultimodalFunctions.decodeImageFeaturesStub(media.filter(col("id") < 5), "media", dim = 8)
    assert(out.schema.fieldNames.contains("features"))
    val rows = out.orderBy("id").collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("features"))
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0) < 1e-9) // L1-normalized histogram
    }
    // deterministic: same input -> same features
    val again = MultimodalFunctions.decodeImageFeaturesStub(media.filter(col("id") < 5), "media", dim = 8)
      .orderBy("id").collect()
    assert(rows.map(_.getSeq[Double](2)).toSeq == again.map(_.getSeq[Double](2)).toSeq)
  }

  test("resizeStub downsamples to at most the target size, deterministically") {
    val out = media.filter(col("id") < 5)
      .select(col("id"), octet_length(MultimodalFunctions.resizeStub(col("media"), 4)).as("n"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 4) // 7 bytes -> 4
    assert(out(3L) == 4) // 8 bytes -> 4
    // short payloads pass through
    val short = Seq(Array[Byte](1, 2)).toDF("media")
      .select(MultimodalFunctions.resizeStub(col("media"), 4)).collect()(0).getAs[Array[Byte]](0)
    assert(short.toSeq == Seq[Byte](1, 2))
  }

  test("frameSampleStub emits n evenly spaced windows") {
    val frames = Seq((1L, (0 until 100).map(_.toByte).toArray)).toDF("id", "media")
      .select(MultimodalFunctions.frameSampleStub(col("media"), n = 4, frameBytes = 5))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 5))
    assert(frames.map(_.head.toInt) == Seq(0, 25, 50, 75)) // evenly spaced starts
  }

  test("decodeImageMeta reads real dimensions from an actual PNG and a JPEG") {
    import java.awt.image.BufferedImage
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK must encode $fmt")
      bos.toByteArray
    }
    val df = Seq(
      (1L, encode(7, 5, "png")),
      (2L, encode(12, 3, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media")
    val got = MultimodalFunctions.decodeImageMeta(df, "media")
      .select("id", "img_width", "img_height", "img_channels").orderBy("id")
      .collect()
      .map(r => r.getLong(0) -> (1 to 3).map(i => if (r.isNullAt(i)) -1 else r.getInt(i)))
      .toMap
    assert(got(1L) == Seq(7, 5, 3), s"png meta: ${got(1L)}")
    assert(got(2L) == Seq(12, 3, 3), s"jpeg meta: ${got(2L)}")
    assert(got(3L) == Seq(-1, -1, -1), "junk bytes must decode to nulls")
    assert(got(4L) == Seq(-1, -1, -1), "null payload must pass through as nulls")
    // the sniffer and the decoder agree on what a PNG is
    val mime = MultimodalFunctions.withMediaMeta(df.filter(col("id") === 1), "media")
      .select("media_mime").collect()(0).getString(0)
    assert(mime == "image/png")
  }

  test("resizeImage scales a real PNG; imageLumaHistogram features the decoded pixels") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(8, 6, 0xFFFFFF)),                       // white
      (2L, png(4, 4, 0x000000)),                       // black
      (3L, "junk".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media")
    val resized = MultimodalFunctions.resizeImage(df, "media", 4, 3)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("resized"))).toMap
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).get))
    assert(back.getWidth == 4 && back.getHeight == 3)
    assert(resized(3L).isEmpty && resized(4L).isEmpty, "junk/null must resize to null")

    val hists = MultimodalFunctions.imageLumaHistogram(df, "media", bins = 16)
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](2))).toMap
    assert(hists(1L).get.last == 1.0, s"white mass in top bin: ${hists(1L).get}")
    assert(hists(2L).get.head == 1.0, s"black mass in bottom bin: ${hists(2L).get}")
    assert(math.abs(hists(1L).get.sum - 1.0) < 1e-9)
    assert(hists(3L).isEmpty && hists(4L).isEmpty)
  }

  test("decodeWavMeta reads rate/channels/bits/duration from a real WAV container") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a genuine WAV encoder (JDK javax.sound), not hand-rolled bytes:
    // 16-bit PCM, 1s of samples at the given rate/channels
    def encode(rate: Int, channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](rate * channels * 2) // exactly 1 second
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, encode(8000, 1)),
      (2L, encode(44100, 2)),
      (3L, "RIFFjunk".getBytes("US-ASCII")), // RIFF magic but no WAVE structure
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media")
    val got = MultimodalFunctions.decodeWavMeta(df, "media")
      .select("id", "wav_sample_rate", "wav_channels", "wav_bits", "wav_duration_ms")
      .orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (1 to 4).map(i => if (r.isNullAt(i)) -1L else r.get(i).toString.toLong))
      .toMap
    assert(got(1L) == Seq(8000L, 1L, 16L, 1000L), s"mono 8k: ${got(1L)}")
    assert(got(2L) == Seq(44100L, 2L, 16L, 1000L), s"stereo 44.1k: ${got(2L)}")
    assert(got(3L) == Seq(-1L, -1L, -1L, -1L), "truncated RIFF must yield nulls")
    assert(got(4L) == Seq(-1L, -1L, -1L, -1L), "null payload must yield nulls")
    // the MIME sniffer agrees it's audio/wav
    val mime = MultimodalFunctions.withMediaMeta(df.filter(col("id") === 1), "media")
      .select("media_mime").collect()(0).getString(0)
    assert(mime == "audio/wav")
  }

  test("decodePcmFeatures recovers exact energy/peak/crossings from a real WAV") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // known samples through the genuine JDK WAV encoder, then back
    val samples = Array[Short](0, 100, -200, 300, 0, -1, 32767, -32768)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "media")
    val got = MultimodalFunctions.decodePcmFeatures(df, "media")
      .select("n_samples", "sum_sq", "peak", "zero_crossings").collect()(0)
    val expSumSq = samples.map(v => v.toLong * v).sum
    // crossings: sign(>=0) sequence + + - + + - + -  => flips at
    // 100→-200, -200→300, 0→-1, -1→32767, 32767→-32768
    assert(got.getInt(0) == samples.length)
    assert(got.getLong(1) == expSumSq)
    assert(got.getInt(2) == 32768)
    assert(got.getLong(3) == 5L)
  }

  test("decodeGifFrames reads every frame of a real animated GIF, skips non-GIFs") {
    def gif(grays: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        for (g <- grays) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val df = Seq(
      (1L, gif(Seq(0, 128, 255), 5, 3)),
      (2L, gif(Seq(42), 2, 2)),
      (3L, "not a gif at all".getBytes("US-ASCII")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media")
    val got = MultimodalFunctions.decodeGifFrames(df, "media")
      .select("id", "frame_idx", "frame_width", "frame_height", "frame_mean_red")
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, 0, 5, 3, 0), (1L, 1, 5, 3, 128), (1L, 2, 5, 3, 255),
      (2L, 0, 2, 2, 42)), got.mkString(","))
  }

  test("decode stub passes null media through as null features") {
    val out = MultimodalFunctions.decodeImageFeaturesStub(media.filter(col("id") === 5), "media")
      .collect()
    assert(out.length == 1 && out(0).isNullAt(2))
  }

  test("adversarial WAV chunk size (0xFFFFFFF8) terminates and yields nulls") {
    // A u32 chunk size of 0xFFFFFFF8, truncated to Int when advancing
    // the chunk walk, is -8 — the offset never moves and the executor
    // task used to spin forever. Both the meta and the PCM walker must
    // instead finish and report the payload as unusable.
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bad = java.nio.ByteBuffer.allocate(64)
    bad.put("RIFF".getBytes("US-ASCII")).put(le32(56L)).put("WAVE".getBytes("US-ASCII"))
    bad.put("JUNK".getBytes("US-ASCII")).put(le32(0xFFFFFFF8L)) // the wrap trigger
    bad.put(new Array[Byte](40))
    // a second payload where the oversized chunk IS the data chunk:
    // the clamp must cap it at the bytes actually present
    val badData = java.nio.ByteBuffer.allocate(32)
    badData.put("RIFF".getBytes("US-ASCII")).put(le32(24L)).put("WAVE".getBytes("US-ASCII"))
    badData.put("data".getBytes("US-ASCII")).put(le32(0xFFFFFFF8L))
    badData.put(new Array[Byte](12))
    val df = Seq((1L, bad.array()), (2L, badData.array())).toDF("id", "media")

    val meta = MultimodalFunctions.decodeWavMeta(df, "media")
      .select("id", "wav_sample_rate").orderBy("id").collect()
    assert(meta.forall(_.isNullAt(1)), "malformed WAV must yield null meta")

    val pcm = MultimodalFunctions.decodePcmFeatures(df, "media")
      .select("id", "n_samples").orderBy("id").collect()
    assert(pcm(0).isNullAt(1), "no data chunk reachable -> null features")
    // row 2: data chunk found, clamped to the 12 real payload bytes
    assert(pcm(1).getInt(1) == 6, s"clamped sample count: ${pcm(1)}")
  }
}
