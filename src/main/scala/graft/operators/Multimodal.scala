package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2.3 #35).
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct. The decode / feature-extract step is a batched
  * `mapPartitions` over the typed Dataset — the distributed shape a
  * real decoder plugs into. The JDK-decodable formats are REALLY
  * decoded: images (PNG/BMP/GIF/JPEG) via `javax.imageio` — feature
  * extraction, resize, GIF frame sampling; audio (WAV/AIFF/AU) via
  * `javax.sound.sampled`. Payloads outside the JDK codec set (and
  * corrupt bytes) degrade to a deterministic byte-derived stub so a
  * mixed corpus flows through without crashing.
  *
  * Scale notes: rows flow through executors in `batchSize` groups
  * (amortizes per-call decoder setup exactly like mapInPandas batch
  * semantics); no driver collection; binary columns stay off-heap in
  * Tungsten rows until the partition iterator touches them.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, blob: Array[Byte], format: String)
  case class MediaFeature(
      doc_id: Long, byte_len: Long, sha256_hex: String,
      width: Long, height: Long, format: String)

  /** Pack a text table into the opaque-blob shape (the stand-in for
    * an image/audio ingest: bytes + metadata). */
  def pack(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      lit("raw").as("format"))

  /** Magic-byte sniff — the cheap gate in front of the decoder so
    * non-image payloads (the common case in a mixed corpus) never pay
    * for an ImageIO reader probe. */
  private[operators] def sniffImageFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("png")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') Some("gif")
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Some("jpeg")
    else None

  /** Decode one batch. Image payloads (PNG/BMP/GIF/JPEG by magic
    * bytes) are REALLY decoded with the JDK's `javax.imageio` — true
    * pixel dimensions, no external libs needed. Everything else (and
    * corrupt image bytes) falls back to the deterministic stub a
    * non-JDK codec (audio/video) would replace, keeping the batched
    * plumbing testable end-to-end either way. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeature] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { r =>
      md.reset()
      val digest = md.digest(r.blob)
      val hex = digest.map(b => f"${b & 0xff}%02x").mkString
      val len = r.blob.length.toLong
      val decoded = sniffImageFormat(r.blob).flatMap { fmt =>
        try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.blob)))
          .map(img => (fmt, img.getWidth.toLong, img.getHeight.toLong))
        catch { case _: Exception => None } // truncated/corrupt payload
      }
      decoded match {
        case Some((fmt, w, h)) => MediaFeature(r.doc_id, len, hex, w, h, fmt)
        case None => MediaFeature(r.doc_id, len, hex,
          width = len % 64 + 1, height = len % 48 + 1, format = r.format)
      }
    }
  }

  /** Batched distributed feature extraction: the Spark-side plumbing
    * (typed Dataset, per-partition batching, encoder round-trip) is
    * real; only the innermost decode is stubbed. */
  def extractFeatures(spark: SparkSession, packed: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    packed.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g))
    }
  }

  case class AudioFeature(
      doc_id: Long, byte_len: Long, sha256_hex: String, format: String,
      channels: Long, sample_rate: Long, n_frames: Long,
      duration_ms: Long, rms: Double)

  /** Magic-byte sniff for the JDK-decodable audio containers
    * (RIFF/WAVE, AIFF, AU) — same cheap gate as [[sniffImageFormat]]. */
  private[operators] def sniffAudioFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("wav")
    else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F') Some("aiff")
    else if (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')
      Some("au")
    else None

  /** Decode one audio batch. WAV/AIFF/AU payloads are REALLY decoded
    * with the JDK's `javax.sound.sampled` — true channel count,
    * sample rate, frame count, duration, and (for 16-bit PCM) the
    * normalized RMS amplitude of the actual samples. Non-audio and
    * corrupt payloads degrade to the deterministic stub, exactly like
    * the image path. */
  private def decodeAudioBatch(batch: Seq[MediaRow]): Seq[AudioFeature] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { r =>
      md.reset()
      val hex = md.digest(r.blob).map(b => f"${b & 0xff}%02x").mkString
      val len = r.blob.length.toLong
      val decoded = sniffAudioFormat(r.blob).flatMap { fmt =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.BufferedInputStream(
              new java.io.ByteArrayInputStream(r.blob)))
          try {
            val af = in.getFormat
            val frames = in.getFrameLength
            val durMs =
              if (af.getFrameRate > 0 && frames >= 0)
                (frames * 1000.0 / af.getFrameRate).toLong
              else -1L
            // normalized RMS over the real samples — 16-bit PCM only
            // (the JDK's WAV/AIFF default); other depths report -1.0
            val rms =
              if (af.getSampleSizeInBits == 16 &&
                  af.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
                val bytes = in.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(bytes).order(
                  if (af.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                var sumSq = 0.0; var n = 0L
                while (bb.remaining() >= 2) {
                  val s = bb.getShort / 32768.0; sumSq += s * s; n += 1
                }
                if (n > 0) math.sqrt(sumSq / n) else 0.0
              } else -1.0
            Some(AudioFeature(r.doc_id, len, hex, fmt,
              af.getChannels.toLong, af.getSampleRate.toLong, frames,
              durMs, rms))
          } finally in.close()
        } catch { case _: Exception => None } // truncated/corrupt payload
      }
      decoded.getOrElse(AudioFeature(r.doc_id, len, hex, r.format,
        channels = 1L, sample_rate = 8000L, n_frames = len,
        duration_ms = len * 1000 / 8000, rms = -1.0))
    }
  }

  /** Batched distributed audio feature extraction — the audio twin of
    * [[extractFeatures]]; same per-partition batching, real decode. */
  def extractAudioFeatures(spark: SparkSession, packed: DataFrame,
                           batchSize: Int = 64): Dataset[AudioFeature] = {
    import spark.implicits._
    packed.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeAudioBatch(g))
    }
  }

  /** PNG-encode a decoded image — the canonical interchange format
    * for resized frames and sampled GIF frames (lossless, JDK-native,
    * deterministic bytes for a given pixel raster). */
  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image resize: PNG/BMP/GIF/JPEG payloads (by magic bytes)
    * are decoded with `javax.imageio`, scaled to exactly (w, h)
    * through `Graphics2D` with bilinear interpolation, and re-encoded
    * as PNG — the output blob is a decodable (w × h) image. Non-image
    * and corrupt payloads degrade to the deterministic stub (a
    * byte-prefix payload sized by the target area) so a mixed corpus
    * flows through without crashing and the plumbing stays testable
    * on text blobs. */
  def resize(spark: SparkSession, packed: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(w > 0 && h > 0, s"target dimensions must be positive: ${w}x$h")
    packed.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val real = sniffImageFormat(r.blob).flatMap { _ =>
          try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.blob))).map { src =>
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, w, h, null)
            } finally g.dispose()
            encodePng(dst)
          } catch { case _: Exception => None } // truncated/corrupt payload
        }
        real match {
          case Some(png) => (r.doc_id, png, w.toLong, h.toLong, "png")
          case None =>
            val n = math.min(r.blob.length, math.max(1, (w * h) / 64))
            (r.doc_id, r.blob.take(n), w.toLong, h.toLong, r.format)
        }
      })
    }.toDF("doc_id", "blob", "width", "height", "format")
  }

  /** Frame sampling — one input row explodes into every-`everyNth`
    * frame rows, the shape a demuxer produces.
    *
    * GIF payloads get REAL frame extraction: `ImageIO.getImageReaders`
    * walks the multi-frame container, every `everyNth` stored frame is
    * decoded and re-encoded as PNG, and `frame_idx` is the frame's
    * index in the original animation. (The JDK GIF reader returns each
    * frame's stored raster; delta-encoded GIFs yield the delta region,
    * full-frame GIFs — e.g. anything the JDK sequence writer produces —
    * yield full frames.)
    *
    * Non-GIF payloads keep the deterministic byte-chunk stub (fixed
    * `frameBytes` slices), standing in for video containers whose
    * demuxers live outside the JDK. */
  def frameSample(
      spark: SparkSession,
      packed: DataFrame,
      frameBytes: Int = 32,
      everyNth: Int = 4,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    packed.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { r =>
        val gif: Option[Seq[(Long, Long, Array[Byte], Long)]] =
          sniffImageFormat(r.blob).filter(_ == "gif").flatMap { _ =>
            try {
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(r.blob))
              try {
                val readers = javax.imageio.ImageIO.getImageReaders(iis)
                if (!readers.hasNext) None
                else {
                  val reader = readers.next()
                  try {
                    reader.setInput(iis)
                    val n = reader.getNumImages(true)
                    Some((0 until n).filter(_ % everyNth == 0).map { i =>
                      val png = encodePng(reader.read(i))
                      (r.doc_id, i.toLong, png, png.length.toLong)
                    })
                  } finally reader.dispose()
                }
              } finally iis.close()
            } catch { case _: Exception => None } // truncated/corrupt payload
          }
        gif.getOrElse {
          r.blob.grouped(frameBytes).zipWithIndex
            .filter(_._2 % everyNth == 0)
            .map { case (frame, idx) =>
              (r.doc_id, idx.toLong, frame, frame.length.toLong)
            }.toSeq
        }
      })
    }.toDF("doc_id", "frame_idx", "frame", "frame_len")
  }

  /** 64-bit dHash (difference hash) of a decoded image: bilinear
    * 9×8 grayscale reduction, bit k set iff pixel (x,y) is brighter
    * than its right neighbor — the standard perceptual fingerprint
    * that survives re-encoding, resizing, and mild edits (the
    * transforms that defeat byte-level dedup of scraped images). */
  private def dHash64(src: java.awt.image.BufferedImage): Long = {
    val scaled = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, 9, 8, null)
    } finally g.dispose()
    def lum(px: Int): Int =
      ((px >> 16 & 0xff) * 299 + (px >> 8 & 0xff) * 587 + (px & 0xff) * 114)
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(scaled.getRGB(x, y)) > lum(scaled.getRGB(x + 1, y)))
          h |= 1L << bit
        bit += 1; x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image perceptual hashes `(doc_id, phash, decoded)` — a
    * shuffle-free batched projection, the image twin of
    * [[graft.operators.Dedup.simHash64]]. Non-image / corrupt
    * payloads degrade to the first 8 sha256 bytes with
    * `decoded = false`: effectively-random hashes that still collide
    * at hamming 0 for BYTE-identical blobs (exact dup detection keeps
    * working on undecodable formats) while two different undecodable
    * payloads land ~32 bits apart — far outside any near-dup
    * threshold. */
  def perceptualHashes(spark: SparkSession, packed: DataFrame,
                       batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    packed.as[MediaRow].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.grouped(batchSize).flatMap(_.map { r =>
        val real = sniffImageFormat(r.blob).flatMap { _ =>
          try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.blob))).map(dHash64)
          catch { case _: Exception => None } // truncated/corrupt payload
        }
        real match {
          case Some(h) => (r.doc_id, h, true)
          case None =>
            md.reset()
            (r.doc_id, java.nio.ByteBuffer.wrap(md.digest(r.blob))
              .getLong(0), false)
        }
      })
    }.toDF("doc_id", "phash", "decoded")
  }

  /** Perceptual NEAR-DUPLICATE image pairs: dHash → banded hamming
    * join → exact popcount verify — byte-identical machinery to
    * [[graft.operators.Dedup.simHashNearDup]] (pigeonhole: hamming ≤
    * maxHamming < bands ⇒ some band matches exactly, so banding is
    * LOSSLESS, no risk budget needed), but over decoded pixels
    * instead of token sets, which is what catches a re-encoded /
    * resized / slightly-edited scrape of the same image. Emits
    * `(id_a, id_b, hamming)` with id_a < id_b.
    *
    * Scale: hashing is a narrow batched projection; identical hashes
    * collapse to one representative before banding (the
    * [[graft.operators.Dedup]] collapse move, in its BOUNDED
    * count+exemplar form — membership is a join on the int64 hash,
    * never a collect_list array), the band shuffle carries (band,
    * slice, id) longs only, and verification is one codegen
    * `bit_count` per distinct candidate pair. */
  def imageNearDup(spark: SparkSession, packed: DataFrame,
                   bands: Int = 4, maxHamming: Int = 3,
                   batchSize: Int = 64): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      "pigeonhole guarantee needs maxHamming <= bands-1")
    val w = 64 / bands
    val mask = if (w == 64) -1L else (1L << w) - 1
    // BOUNDED identical-hash collapse: (phash, rep) only — members
    // come back through a cheap int64 hash join instead of a
    // collect_list array a billion-fold duplicate could blow up.
    // `hashes` is read twice (collapse + member join) and its decode
    // is the dominant cost, so checkpoint lazily: every image is
    // decoded exactly once, both uses read the stored (id, phash)
    // longs (see Dedup.membersVia)
    val hashes = perceptualHashes(spark, packed, batchSize)
      .localCheckpoint(false)
    val groups = hashes
      .groupBy("phash")
      .agg(min(col("doc_id")).as("__gid"))
    val withH = groups.select(col("__gid").as("__id"), col("phash").as("__h"))
    val bandDf = withH
      .select(col("__id"), col("__h"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> named_struct(" +
            s"'band', b, 'slice', shiftright(__h, b * $w) & ${mask}L))")).as("__b"))
      .select(col("__id"), col("__h"),
        col("__b.band").as("__band"), col("__b.slice").as("__slice"))
    val a = bandDf.select(col("__band"), col("__slice"),
      col("__id").as("id_a"), col("__h").as("h_a"))
    val b2 = bandDf.select(col("__band"), col("__slice"),
      col("__id").as("id_b"), col("__h").as("h_b"))
    val repPairs = a.join(b2, Seq("__band", "__slice"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    val members = hashes.join(groups, "phash")
      .select(col("doc_id").as("__mid"), col("__gid"))
    val cross = repPairs
      .join(members.select(col("__gid").as("id_a"), col("__mid").as("mid_a")), "id_a")
      .join(members.select(col("__gid").as("id_b"), col("__mid").as("mid_b")), "id_b")
      .select(least(col("mid_a"), col("mid_b")).as("id_a"),
        greatest(col("mid_a"), col("mid_b")).as("id_b"), col("hamming"))
    val within = members.as("m1")
      .join(members.as("m2"), col("m1.__gid") === col("m2.__gid"))
      .filter(col("m1.__mid") < col("m2.__mid"))
      .select(col("m1.__mid").as("id_a"), col("m2.__mid").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within)
  }
}
