package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("packed blobs flow through batched extraction with correct features") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 32)
    val row = out.filter(_.doc_id == 0L).head()
    val text = docs.filter("doc_id = 0").head().getAs[String]("text")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(row.sha256_hex == expected)
    assert(row.byte_len == text.getBytes("UTF-8").length)
    assert(row.width == row.byte_len % 64 + 1 && row.format == "raw")
    assert(out.count() == docs.count())
  }

  test("real image payloads decode to TRUE dimensions via javax.imageio") {
    val s = spark
    import s.implicits._
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode(17, 23, "png")
    val bmp = encode(5, 41, "bmp")
    val corrupt = png.take(30) // valid magic, truncated body
    val packed = Seq(
      (1L, png, "bin"), (2L, bmp, "bin"), (3L, corrupt, "bin"),
      (4L, "just text".getBytes("UTF-8"), "raw"))
      .toDF("doc_id", "blob", "format")
    val out = Multimodal.extractFeatures(s, packed, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 17L && out(1L).height == 23L && out(1L).format == "png")
    assert(out(2L).width == 5L && out(2L).height == 41L && out(2L).format == "bmp")
    // corrupt image bytes and non-image payloads fall back to the
    // deterministic stub — no crash, stub dimensions
    assert(out(3L).width == corrupt.length % 64 + 1 && out(3L).format == "bin")
    assert(out(4L).width == 9L % 64 + 1 && out(4L).format == "raw")
    // sha/length features are decode-independent
    assert(out(1L).byte_len == png.length.toLong)
  }

  test("real WAV payloads decode to TRUE rate/channels/frames/duration/RMS via javax.sound") {
    val s = spark
    import s.implicits._
    // hand-build a PCM16 WAV through the JDK encoder so the bytes are
    // a genuine container, then verify graft recovers the true signal
    def wav(rate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().put(samples)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // one full period of a sine at amplitude 16384: RMS = 16384/√2 /32768
    val n = 8000
    val sine = Array.tabulate(n)(i =>
      (16384 * math.sin(2 * math.Pi * i / n)).toShort)
    val mono = wav(8000f, 1, sine)
    val stereo = wav(44100f, 2, Array.tabulate(200)(i => (i * 3).toShort))
    val corrupt = mono.take(20) // RIFF/WAVE magic intact, body gone
    val packed = Seq(
      (1L, mono, "bin"), (2L, stereo, "bin"), (3L, corrupt, "bin"),
      (4L, "just text".getBytes("UTF-8"), "raw"))
      .toDF("doc_id", "blob", "format")
    val out = Multimodal.extractAudioFeatures(s, packed, batchSize = 3)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).format == "wav" && out(1L).channels == 1L &&
      out(1L).sample_rate == 8000L && out(1L).n_frames == n.toLong &&
      out(1L).duration_ms == 1000L)
    val expectedRms = math.sqrt(
      sine.map(v => math.pow(v / 32768.0, 2)).sum / n)
    assert(math.abs(out(1L).rms - expectedRms) < 1e-12)
    assert(out(2L).format == "wav" && out(2L).channels == 2L &&
      out(2L).sample_rate == 44100L && out(2L).n_frames == 100L)
    // corrupt audio bytes and non-audio payloads fall back to the
    // deterministic stub — no crash
    assert(out(3L).format == "bin" && out(3L).rms == -1.0 &&
      out(3L).n_frames == corrupt.length.toLong)
    assert(out(4L).format == "raw" && out(4L).sample_rate == 8000L)
    assert(out(1L).byte_len == mono.length.toLong)
  }

  test("batch size does not change results (plumbing is pure)") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(100)
    val a = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 1)
      .collect().toSet
    val b = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 1000)
      .collect().toSet
    assert(a == b)
  }

  test("resize: blob-in/blob-out shape, payload bounded by target area") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val out = Multimodal.resize(spark, Multimodal.pack(docs), w = 64, h = 64)
    assert(out.columns.toSeq == Seq("doc_id", "blob", "width", "height", "format"))
    val rows = out.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("blob").length <= 64 * 64 / 64)
      assert(r.getAs[Long]("width") == 64L && r.getAs[Long]("height") == 64L)
    }
  }

  test("resize: real image payloads scale to true target dimensions, decodable PNG out") {
    val s = spark
    import s.implicits._
    // 16x12 solid red PNG: bilinear downscale of a constant image is
    // the same constant, so the output pixels are checkable exactly
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g0 = img.createGraphics()
    g0.setColor(java.awt.Color.RED); g0.fillRect(0, 0, 16, 12); g0.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val packed = Seq((1L, png, "bin"), (2L, "just text".getBytes("UTF-8"), "raw"))
      .toDF("doc_id", "blob", "format")
    val out = Multimodal.resize(s, packed, w = 8, h = 6)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val blob = out(1L).getAs[Array[Byte]]("blob")
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(decoded != null && decoded.getWidth == 8 && decoded.getHeight == 6)
    assert((decoded.getRGB(4, 3) & 0xffffff) == 0xff0000,
      "constant-red image must stay red through a bilinear resize")
    assert(out(1L).getAs[String]("format") == "png")
    // non-image payloads keep the deterministic stub
    assert(out(2L).getAs[String]("format") == "raw")
    assert(out(2L).getAs[Array[Byte]]("blob").length <= math.max(1, 8 * 6 / 64))
  }

  test("frame sampling: real multi-frame GIF yields true frames with true dimensions") {
    val s = spark
    import s.implicits._
    // write a genuine 3-frame animated GIF through the JDK sequence writer
    def gif(frames: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    val threeFrames = gif(Seq(0xff0000, 0x00ff00, 0x0000ff), 9, 7)
    val packed = Seq((5L, threeFrames, "bin")).toDF("doc_id", "blob", "format")

    val all = Multimodal.frameSample(s, packed, everyNth = 1)
      .orderBy("frame_idx").collect()
    assert(all.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 1L, 2L),
      "a 3-frame GIF must yield exactly its 3 real frames")
    all.foreach { r =>
      val f = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(f != null && f.getWidth == 9 && f.getHeight == 7,
        "sampled frames must decode to the animation's true dimensions")
    }
    // every-2nd sampling keeps original animation indexes 0 and 2
    val sampled = Multimodal.frameSample(s, packed, everyNth = 2)
      .orderBy("frame_idx").collect()
    assert(sampled.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L))
  }

  test("frame sampling explodes one blob into every-nth fixed-size frames, deterministically") {
    val s = spark
    import s.implicits._
    val one = Seq((7L, ("x" * 100).getBytes("UTF-8"), "raw"))
      .toDF("doc_id", "blob", "format")
    val frames = Multimodal.frameSample(s, one, frameBytes = 32, everyNth = 2)
      .orderBy("frame_idx").collect()
    // 100 bytes → frames 0..3 (32,32,32,4); every 2nd → idx 0 and 2
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L))
    assert(frames.map(_.getAs[Long]("frame_len")).toSeq == Seq(32L, 32L))
    val again = Multimodal.frameSample(s, one, frameBytes = 32, everyNth = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }) sameElements again.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }))
  }

  test("perceptual dHash: re-encoded/resized images collide, different images don't") {
    val s = spark
    import s.implicits._
    def gradient(w: Int, h: Int, fmt: String): Array[Byte] = {
      // smooth horizontal gradient — dHash-stable under resizing
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = (x * 255) / math.max(1, w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def reverse(w: Int, h: Int): Array[Byte] = {
      // the mirrored gradient — every dHash comparison flips
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = 255 - (x * 255) / math.max(1, w - 1)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val big = gradient(64, 48, "png")      // the "original"
    val small = gradient(32, 24, "png")    // a resized re-scrape
    val bmp = gradient(64, 48, "bmp")      // same pixels, other codec
    val other = reverse(64, 48)            // genuinely different image
    val text = "not an image at all".getBytes("UTF-8")
    val packed = Seq(
      (1L, big, "bin"), (2L, small, "bin"), (3L, bmp, "bin"),
      (4L, other, "bin"), (5L, text, "raw"), (6L, text, "raw"))
      .toDF("doc_id", "blob", "format")
    val hashes = Multimodal.perceptualHashes(s, packed)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(hashes(1L)._2 && hashes(2L)._2 && hashes(3L)._2 && hashes(4L)._2)
    assert(!hashes(5L)._2) // undecodable -> sha-derived stub hash
    assert(hashes(5L)._1 == hashes(6L)._1) // byte-identical blobs collide
    assert(java.lang.Long.bitCount(hashes(1L)._1 ^ hashes(4L)._1) > 16,
      "different images must be far apart")
    val pairs = Multimodal.imageNearDup(s, packed, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the three renditions of the same image pair up, transitively
    assert(pairs.contains((1L, 2L)), pairs.toString)
    assert(pairs.contains((1L, 3L)), pairs.toString)
    assert(pairs.contains((2L, 3L)), pairs.toString)
    assert(pairs((1L, 3L)) == 0L) // same pixels -> identical hash
    // the different image pairs with none of them
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L), pairs.toString)
    // byte-identical undecodable payloads surface as exact dups
    assert(pairs((5L, 6L)) == 0L)
  }
}
