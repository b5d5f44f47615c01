package graft.multimodal

import graft.functions.Fnv
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample as batched
  * executor-side transforms (`mapPartitions` — the Scala analogue of
  * the Pandas-UDF/mapInPandas batch shape).
  *
  * ALL THREE modalities decode for real, with zero extra dependencies:
  *  - images are genuine PNG bytes decoded by `javax.imageio`
  *    ([[ImageCodec]]), resized with a deterministic nearest-neighbor
  *    sampler, with exact pixel statistics;
  *  - audio is genuine 16-bit PCM WAV decoded through
  *    `javax.sound.sampled` ([[AudioCodec]]) with exact sample
  *    statistics;
  *  - video is a genuine RIFF AVI container (hdrl/movi/idx1 chunk
  *    walk, [[VideoCodec]]) carrying PNG-codec ('MPNG') frames for
  *    the exact-stat oracle and JPEG ('MJPG') frames for the lossy
  *    real-world codec family — frame sampling demuxes the real
  *    container format and decodes the selected frames through the
  *    real ImageIO path.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  final case class MediaRow(media_id: Long, kind: String,
      content: Array[Byte], meta: MediaMeta)

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      embedding: Seq[Float])

  final case class FrameStat(media_id: Long, frame_idx: Int,
      width: Int, height: Int, pixel_sum: Long)

  // ======================================================================
  // REAL IMAGE CODEC — JDK javax.imageio PNG/JPEG decode, deterministic
  // synthesis and resize. Executor-safe, no external dependencies.
  // ======================================================================
  object ImageCodec {
    // no temp-file cache: decoding happens inside executor tasks
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic RGB pixel for (x, y) under a seed. */
    def pixel(seed: Long, x: Int, y: Int): Int =
      (Fnv.hash64(s"$seed:$x:$y".getBytes("UTF-8")) & 0xffffff).toInt

    /** Encode a real PNG with deterministic pixels (written straight
      * into the INT_RGB backing raster — per-pixel `setRGB` goes
      * through color-model conversion and is several times slower). */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          data(y * width + x) = pixel(seed, x, y); x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Encode a real baseline JPEG of the same deterministic pixels.
      * JPEG is lossy, so decoded stats are asserted with tolerance in
      * specs, never under the exact oracle (which uses PNG). */
    def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          data(y * width + x) = pixel(seed, x, y); x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }

    private def rgbSum(px: Array[Int]): Long = {
      var sum = 0L
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        i += 1
      }
      sum
    }

    /** Decode PNG/JPEG bytes → (width, height, sum of R+G+B over all
      * pixels). None when the payload is not a decodable image. */
    def decode(content: Array[Byte]): Option[(Int, Int, Long)] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        Some((w, h, rgbSum(img.getRGB(0, 0, w, h, null, 0, w))))
      }
    }

    /** Deterministic nearest-neighbor resize → pixel-sum statistic of
      * the resized image. (Graphics2D interpolation is rendering-
      * pipeline dependent; explicit sampling is bit-stable across
      * JVMs.) */
    def resizeNearest(content: Array[Byte], tw: Int, th: Int)
        : Option[Long] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sum = 0L
        var y = 0
        while (y < th) {
          val sy = math.min(h - 1, y * h / th)
          var x = 0
          while (x < tw) {
            val sx = math.min(w - 1, x * w / tw)
            val rgb = px(sy * w + sx)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(sum)
      }
    }
  }

  // ======================================================================
  // REAL AUDIO CODEC — 16-bit PCM mono WAV, decoded through the JDK's
  // javax.sound.sampled (the container/format parsing is the real audio
  // stack, not a byte peek). Executor-safe, headless-safe (WAV parsing
  // needs no audio device), no external dependencies.
  // ======================================================================
  object AudioCodec {
    /** Deterministic signed 16-bit sample for (id, i). */
    def sampleAt(id: Long, i: Int): Int =
      ((Fnv.hash64(s"$id:a:$i".getBytes("UTF-8")) & 0xffffL) - 32768L).toInt

    /** Encode a real RIFF/WAVE file: 44-byte canonical header +
      * little-endian 16-bit PCM mono samples. */
    def encodeWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) { buf.putShort(sampleAt(id, i).toShort); i += 1 }
      buf.array()
    }

    /** Decode WAV bytes via `AudioSystem` →
      * (sampleRate, nSamples, sum of samples, max |sample|). None when
      * the payload is not decodable 16-bit mono PCM. */
    def decode(content: Array[Byte])
        : Option[(Int, Int, Long, Int)] = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0
          var sum = 0L
          var maxAbs = 0
          while (bb.remaining() >= 2) {
            val v = bb.getShort.toInt
            n += 1; sum += v
            if (math.abs(v) > maxAbs) maxAbs = math.abs(v)
          }
          Some((fmt.getSampleRate.toInt, n, sum, maxAbs))
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }
  }

  // ======================================================================
  // REAL VIDEO CONTAINER — RIFF AVI (the same RIFF family the WAV reader
  // parses), muxed and demuxed here chunk-for-chunk: LIST/hdrl with avih +
  // strl(strh,strf), LIST/movi with one '00dc' chunk per frame, idx1
  // index. Frames are PNG-compressed ('MPNG' handler — the lossless
  // MJPEG-family codec ffmpeg writes for `-c:v png -f avi`), so sampled
  // frames decode through the real ImageIO path with exact pixel
  // statistics the oracle can mirror. A production deployment pointed at
  // MJPEG files keeps this demuxer and swaps only the per-frame decode's
  // expectations (lossy stats).
  // ======================================================================
  object VideoCodec {
    /** Per-frame pixel seed, mirrored by the mm_video_frames oracle. */
    def frameSeed(id: Long, frameIdx: Int): Long = id * 1000L + frameIdx

    private def padded(n: Int): Int = n + (n & 1)

    /** Mux deterministic PNG frames into a genuine AVI file (the
      * 'MPNG' handler — lossless, so the driver oracle can mirror
      * frame stats exactly). */
    def encodeAvi(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] =
      muxAvi("MPNG", (0 until nFrames)
        .map(f => ImageCodec.encodePng(w, h, frameSeed(id, f))), w, h)

    /** Mux deterministic JPEG frames ('MJPG' handler — the dominant
      * real-world intra-frame AVI codec). Same container walk, lossy
      * frames: specs assert decoded stats with tolerance. */
    def encodeAviMjpg(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] =
      muxAvi("MJPG", (0 until nFrames)
        .map(f => ImageCodec.encodeJpeg(w, h, frameSeed(id, f))), w, h)

    /** Mux pre-encoded frames into a genuine AVI file:
      * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh vids/handler,
      * strf BITMAPINFOHEADER}} → LIST(movi){'00dc' chunks, even-byte
      * padded} → idx1. All sizes little-endian per RIFF. */
    def muxAvi(handler: String, frames: Seq[Array[Byte]], w: Int,
        h: Int): Array[Byte] = {
      val nFrames = frames.length
      val avihSize = 56; val strhSize = 56; val strfSize = 40
      val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
      val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
      val moviSize = 4 + frames.map(fb => 8 + padded(fb.length)).sum
      val idx1Size = 16 * nFrames
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
      val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
      fcc("RIFF"); buf.putInt(riffSize); fcc("AVI ")
      fcc("LIST"); buf.putInt(hdrlSize); fcc("hdrl")
      fcc("avih"); buf.putInt(avihSize)
      buf.putInt(100000)           // dwMicroSecPerFrame: 10 fps
        .putInt(0).putInt(0)       // dwMaxBytesPerSec, dwPaddingGranularity
        .putInt(0x10)              // dwFlags: AVIF_HASINDEX
        .putInt(nFrames)           // dwTotalFrames
        .putInt(0).putInt(1)       // dwInitialFrames, dwStreams
        .putInt(0)                 // dwSuggestedBufferSize
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      fcc("LIST"); buf.putInt(strlSize); fcc("strl")
      fcc("strh"); buf.putInt(strhSize)
      fcc("vids"); fcc(handler)    // fccType, fccHandler
      buf.putInt(0)                // dwFlags
        .putShort(0).putShort(0)   // wPriority, wLanguage
        .putInt(0)                 // dwInitialFrames
        .putInt(1).putInt(10)      // dwScale/dwRate = 10 fps
        .putInt(0)                 // dwStart
        .putInt(nFrames)           // dwLength (frames)
        .putInt(0)                 // dwSuggestedBufferSize
        .putInt(-1).putInt(0)      // dwQuality, dwSampleSize
        .putShort(0).putShort(0)   // rcFrame left, top
        .putShort(w.toShort).putShort(h.toShort)
      fcc("strf"); buf.putInt(strfSize)
      buf.putInt(40)               // biSize (BITMAPINFOHEADER)
        .putInt(w).putInt(h)
        .putShort(1).putShort(24)  // biPlanes, biBitCount
      fcc(handler)                 // biCompression
      buf.putInt(0)                // biSizeImage (allowed 0 for compressed)
        .putInt(0).putInt(0)       // biX/YPelsPerMeter
        .putInt(0).putInt(0)       // biClrUsed, biClrImportant
      fcc("LIST"); buf.putInt(moviSize); fcc("movi")
      val offsets = new Array[Int](nFrames)
      var off = 4                  // idx1 offsets: from the 'movi' fourcc
      frames.zipWithIndex.foreach { case (fb, i) =>
        offsets(i) = off
        fcc("00dc"); buf.putInt(fb.length); buf.put(fb)
        if ((fb.length & 1) == 1) buf.put(0.toByte)
        off += 8 + padded(fb.length)
      }
      fcc("idx1"); buf.putInt(idx1Size)
      frames.zipWithIndex.foreach { case (fb, i) =>
        fcc("00dc"); buf.putInt(0x10) // AVIIF_KEYFRAME
        buf.putInt(offsets(i)).putInt(fb.length)
      }
      buf.array()
    }

    /** Demux the AVI chunk walk (RIFF header → top-level chunks →
      * LIST/movi → '00dc'/'00db' sub-chunks with even-byte padding)
      * and REALLY decode every `everyNth` frame →
      * (frame_idx, width, height, pixel_sum). Malformed containers or
      * undecodable frames yield nothing (error-sink semantics). */
    def sampleFrames(content: Array[Byte], everyNth: Int)
        : Seq[(Int, Int, Int, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      val out = Seq.newBuilder[(Int, Int, Int, Long)]
      if (bb.remaining() < 12 || fourcc() != "RIFF") return Seq.empty
      bb.getInt // riff payload size; trust remaining() instead
      if (fourcc() != "AVI ") return Seq.empty
      var f = 0
      while (bb.remaining() >= 8) {
        val id = fourcc()
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return out.result()
        val bodyEnd = bb.position() + size
        if (id == "LIST" && size >= 4 && fourcc() == "movi") {
          while (bb.position() + 8 <= bodyEnd) {
            val cid = fourcc()
            val csize = bb.getInt
            // long arithmetic: a malformed csize near Int.MaxValue
            // would overflow position()+csize to negative, slip past
            // the bound check, and allocate ~2 GB before throwing
            if (csize < 0 || bb.position().toLong + csize > bodyEnd)
              return out.result()
            if (cid.endsWith("dc") || cid.endsWith("db")) {
              val fb = new Array[Byte](csize)
              bb.get(fb)
              if (f % everyNth == 0)
                ImageCodec.decode(fb).foreach { case (w, h, s) =>
                  out += ((f, w, h, s))
                }
              f += 1
            } else bb.position(bb.position() + csize)
            if ((csize & 1) == 1 && bb.position() < bodyEnd)
              bb.position(bb.position() + 1) // even-byte chunk padding
          }
        }
        val next = bodyEnd + (size & 1)
        if (next > bb.limit()) return out.result()
        bb.position(next)
      }
      out.result()
    }
  }

  /** Deterministic payload-hash embedding (content fingerprints for
    * the similarity operators; a production pipeline swaps in a model
    * server call with the same batch shape). */
  object FakeCodec {
    /** Feature extraction: D-dim embedding from payload bytes. */
    def embed(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val h = Fnv.hash64(content, i)
        out(i) = (h.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }
  }

  val AllKinds: Set[String] = Set("image", "audio", "video")

  /** Build a deterministic media table from the documents table: image
    * rows carry REAL PNG payloads, audio rows REAL 16-bit PCM WAV,
    * video rows a container of REAL PNG frames — all deterministic
    * (seeded by doc_id, sized from n_chars) with typed metadata.
    * Production reads real blobs the same way (binary column +
    * metadata struct).
    *
    * `payloadKinds` is the synthesis analogue of column pruning: a
    * consumer that never decodes a kind's payload (e.g. the feature
    * summary, whose audio/video descriptors come from metadata) skips
    * its encode cost; unrequested kinds carry an empty payload. A
    * parquet-backed production media table gets this for free from
    * predicate pushdown + lazy blob columns. */
  def mediaTable(spark: SparkSession, dir: String,
      payloadKinds: Set[String] = AllKinds): Dataset[MediaRow] = {
    import spark.implicits._
    val none = Array.emptyByteArray
    // codecs are the per-row cost: spread the single-row-group scan
    // across the session's parallelism before encoding
    graft.core.par(graft.core.t(spark, dir, "documents"))
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, _, nChars) =>
        (id % 3) match {
          case 0 =>
            val w = (nChars % 64).toInt + 8
            val h = (nChars % 48).toInt + 6
            MediaRow(id, "image",
              if (payloadKinds("image")) ImageCodec.encodePng(w, h, seed = id)
              else none,
              MediaMeta("image/png", width = w, height = h,
                sampleRate = 0, durationMs = 0))
          case 1 =>
            val n = (nChars % 400).toInt + 100
            MediaRow(id, "audio",
              if (payloadKinds("audio")) AudioCodec.encodeWav(id, n, 16000)
              else none,
              MediaMeta("audio/wav", width = 0, height = 0,
                sampleRate = 16000, durationMs = nChars * 10))
          case _ =>
            val nf = (nChars % 8).toInt + 3
            val w = (nChars % 16).toInt + 8
            val h = (nChars % 12).toInt + 6
            MediaRow(id, "video",
              if (payloadKinds("video")) VideoCodec.encodeAvi(id, nf, w, h)
              else none,
              MediaMeta("video/x-msvideo", width = 0, height = 0,
                sampleRate = 16000, durationMs = nChars * 10))
        }
      }
  }

  /** Decode+resize for image rows — REAL ImageIO decode, batched per
    * partition; the iterator is consumed lazily so a partition never
    * materializes in memory (the mapInPandas batch contract).
    * Undecodable payloads are dropped (production would route them to
    * an error sink). */
  def imagePipeline(images: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[(Long, Int, Int, Long)] = {
    import images.sparkSession.implicits._
    images.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { m =>
        ImageCodec.resizeNearest(m.content, targetW, targetH).map { sum =>
          (m.media_id, targetW, targetH, sum)
        }
      }
    }
  }

  /** Feature extraction over any media kind → fixed-dim embedding,
    * ready for the similarity operators (s_cosine_topk). */
  def features(media: Dataset[MediaRow], dim: Int = 64)
      : Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        ImageFeatures(m.media_id, m.meta.width, m.meta.height,
          FakeCodec.embed(m.content, dim).toSeq)
      }
    }
  }

  /** Frame sampling for video rows: walk the container and REALLY
    * decode every `everyNth` PNG frame (ImageIO) → exact per-frame
    * pixel statistics. */
  def frameSamples(media: Dataset[MediaRow], everyNth: Int = 10)
      : Dataset[FrameStat] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      VideoCodec.sampleFrames(m.content, everyNth).map {
        case (idx, w, h, psum) => FrameStat(m.media_id, idx, w, h, psum)
      }
    }
  }

  /** Driver-surface query with a FULL DuckDB oracle: image rows only,
    * REAL `javax.imageio` decode of the PNG payload → decoded
    * dimensions + exact pixel sum. Because the payload pixels are
    * seeded-FNV deterministic and PNG RGB is lossless, the oracle can
    * recompute the identical sums from the pixel formula without ever
    * decoding an image — an end-to-end correctness check ON the real
    * decode path (encode → PNG bytes → ImageIO decode → statistics).
    */
  def imageStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, payloadKinds = Set("image"))
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.flatMap { m =>
          ImageCodec.decode(m.content).map { case (w, h, psum) =>
            (m.media_id, w, h, psum)
          }
        }
      }
      .toDF("media_id", "width", "height", "pixel_sum")
      .orderBy("media_id")
  }

  /** Driver-surface query with a FULL DuckDB oracle: media features
    * summarized. Image rows report REAL decoded dimensions and exact
    * pixel sums from the PNG payload (javax.imageio); every row then
    * embeds its DECODED feature descriptor (`kind:id:w:h:psum`) — not
    * the opaque payload bytes — so the real decode output is
    * load-bearing for the embedding and the whole pipeline
    * (encode → decode → describe → embed → norm) is exactly
    * mirrorable in SQL via the same FNV-1a + fmix mirror the
    * `mm_image_stats` oracle uses. (Payload-bytes embeddings remain
    * available through [[features]].) */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, payloadKinds = Set("image"))
      .mapPartitions { it =>
      it.map { m =>
        val decoded =
          if (m.kind == "image") ImageCodec.decode(m.content) else None
        val (w, h, psum) = decoded.getOrElse(
          (m.meta.width, m.meta.height, -1L))
        val desc = s"${m.kind}:${m.media_id}:$w:$h:$psum"
        val emb = FakeCodec.embed(desc.getBytes("UTF-8"), 64)
        (m.media_id, m.kind, w, h, psum,
          emb.map(x => x.toDouble * x.toDouble).sum)
      }
    }.toDF("media_id", "kind", "width", "height", "pixel_sum",
      "embedding_norm2")
      .orderBy("media_id")
  }

  /** Driver-surface query with a FULL DuckDB oracle: audio rows only,
    * REAL `javax.sound.sampled` decode of the WAV payload → sample
    * rate, sample count, exact sample sum and peak. The samples are
    * seeded-FNV deterministic and PCM is lossless, so the oracle
    * recomputes the identical statistics from the sample formula
    * without decoding audio — end-to-end coverage of the real decode
    * path (encode → WAV bytes → AudioSystem decode → statistics),
    * exactly mirroring the mm_image_stats design. */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir, payloadKinds = Set("audio"))
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.flatMap { m =>
          AudioCodec.decode(m.content).map { case (rate, n, sum, maxAbs) =>
            (m.media_id, rate, n, sum, maxAbs)
          }
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "sum_samples",
        "max_abs")
      .orderBy("media_id")
  }

  /** Driver-surface query with a FULL DuckDB oracle: video rows only,
    * every 3rd frame REALLY decoded from the PNG-frame container →
    * per-frame dimensions + exact pixel sum (the mm_image_stats
    * check, per sampled frame). */
  def videoFrameStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameSamples(mediaTable(spark, dir, payloadKinds = Set("video")),
        everyNth = 3)
      .toDF()
      .orderBy("media_id", "frame_idx")
  }
}
