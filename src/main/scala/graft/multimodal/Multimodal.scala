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
  * The IMAGE path is real: payloads are genuine PNG bytes and
  * [[ImageCodec]] decodes them with the JDK's `javax.imageio` (zero
  * extra dependencies), resizes with a deterministic nearest-neighbor
  * sampler, and reports exact pixel statistics. Audio/video decoding
  * stays STUBBED (`FakeCodec`, no codec libraries in this
  * environment) behind the same batched plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(mime: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  final case class MediaRow(media_id: Long, kind: String,
      content: Array[Byte], meta: MediaMeta)

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      embedding: Seq[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int,
      frame_hash: Long)

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
  // STUB CODEC — deterministic fake standing in for audio/video decoding
  // only (no ffmpeg in this environment). A real deployment replaces only
  // this object (e.g. with javacv/ffmpeg bindings); the Spark plumbing is
  // unchanged. Images use the REAL ImageCodec above.
  // ======================================================================
  object FakeCodec {
    /** "Frame-sample" a video payload: one hash per sampled frame. */
    def sampleFrames(content: Array[Byte], everyNth: Int,
        nFrames: Int): Seq[(Int, Long)] =
      (0 until nFrames by everyNth).map { i =>
        i -> Fnv.hash64(content, i)
      }

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

  /** Build a deterministic media table from the documents table:
    * image rows carry REAL PNG payloads (deterministic pixels seeded
    * by doc_id, dimensions derived from n_chars), audio/video rows
    * carry text bytes, all with typed metadata. Production reads real
    * blobs the same way (binary column + metadata struct). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        if (kind == "image") {
          val w = (nChars % 64).toInt + 8
          val h = (nChars % 48).toInt + 6
          MediaRow(id, kind, ImageCodec.encodePng(w, h, seed = id),
            MediaMeta("image/png", width = w, height = h,
              sampleRate = 0, durationMs = 0))
        } else
          MediaRow(id, kind, text.getBytes("UTF-8"),
            MediaMeta(s"fake/$kind", width = 0, height = 0,
              sampleRate = 16000, durationMs = nChars * 10))
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

  /** Frame sampling for video rows: every `everyNth` frame of a
    * pseudo 30fps stream. */
  def frameSamples(media: Dataset[MediaRow], everyNth: Int = 10)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, (m.meta.durationMs / 33).toInt)
      FakeCodec.sampleFrames(m.content, everyNth, nFrames).map {
        case (idx, h) => FrameSample(m.media_id, idx, h)
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
    mediaTable(spark, dir)
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
    mediaTable(spark, dir).mapPartitions { it =>
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
}
