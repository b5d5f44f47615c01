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
  * The actual codec calls are STUBBED (no image/audio libraries in
  * this environment): `FakeCodec` derives deterministic pseudo-decoded
  * frames/samples from the payload bytes. Everything around the stub —
  * schema, partitioning, batch iteration, output shapes — is real and
  * is what a production codec would drop into.
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
  // STUB CODEC — deterministic fake standing in for image/audio decoding.
  // A real deployment replaces only this object (e.g. with javacv/ffmpeg
  // bindings); the Spark plumbing below is unchanged.
  // ======================================================================
  object FakeCodec {
    /** "Decode" an image payload: dimensions from the metadata, pixel
      * statistics derived from payload bytes. Deterministic. */
    def decodeImage(content: Array[Byte], meta: MediaMeta): (Int, Int, Long) =
      (meta.width, meta.height, Fnv.hash64(content))

    /** "Resize": deterministic re-hash folding in target dims. */
    def resize(pixelsHash: Long, w: Int, h: Int): Long =
      Fnv.hash64(s"$pixelsHash:$w:$h".getBytes("UTF-8"))

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

  /** Build a deterministic media table from the documents table: text
    * bytes as payloads, alternating kinds, synthesized metadata. This
    * is the test/bench input; production reads real blobs the same
    * way (binary column + metadata struct). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          MediaMeta(s"fake/$kind", width = (nChars % 640).toInt + 64,
            height = (nChars % 480).toInt + 48, sampleRate = 16000,
            durationMs = nChars * 10))
      }
  }

  /** Decode+resize for image rows — batched per partition; the
    * iterator is consumed lazily so a partition never materializes in
    * memory (the mapInPandas batch contract). */
  def imagePipeline(images: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[(Long, Int, Int, Long)] = {
    import images.sparkSession.implicits._
    images.filter(_.kind == "image").mapPartitions { it =>
      it.map { m =>
        val (w, h, pixels) = FakeCodec.decodeImage(m.content, m.meta)
        (m.media_id, targetW, targetH,
          FakeCodec.resize(pixels, targetW, targetH))
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

  /** Driver-surface query: media features summarized (rows-only
    * check; the codec is a stub, the plumbing is what's exercised). */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    features(mediaTable(spark, dir))
      .map(f => (f.media_id, f.width, f.height,
        f.embedding.map(x => x.toDouble * x.toDouble).sum))
      .toDF("media_id", "width", "height", "embedding_norm2")
      .orderBy("media_id")
  }
}
