package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column conventions for training-data pipelines: media is
  * an opaque `binary` column plus a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as typed
  * `mapPartitions` operators so a heavyweight codec is initialized
  * ONCE per partition and rows stream through it — the Scala analog of
  * a batched pandas UDF, and the shape that matters at 100 TB (no
  * per-row codec setup, no driver collect, partition-parallel).
  *
  * Codec status: the IMAGE decode path is REAL — `javax.imageio`
  * (JDK built-in, no external dependency) decodes PNG/JPEG/GIF/BMP
  * payloads to true width/height/channels plus average luminance.
  * Payloads no installed reader recognizes (and the audio/video
  * operations — resize re-encode, frame extraction, learned features)
  * fall back to the clearly-marked deterministic fake, because this
  * container ships no media codecs beyond the JDK. Everything around
  * the codec — schemas, encoders, batch shape, explode semantics,
  * partitioning — is real and tested; swapping in a full codec
  * touches only [[StubCodec]].
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(kind: String, mimeType: String, sizeBytes: Long)
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Int, height: Int, channels: Int, brightness: Double)
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])
  final case class MediaFeatures(media_id: Long, dim: Int, features: Array[Double])

  implicit val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val decodedEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Per-partition codec. Image decode is real (`javax.imageio`);
    * the remaining operations are === STUB === deterministic fakes —
    * a full deployment replaces them with JNI/javacv bindings. The
    * call signature (init once per partition, then per-record calls)
    * is the contract the operators rely on.
    */
  final class StubCodec {
    /** Decode image payloads with the JDK's ImageIO: true dimensions,
      * color-model component count, and mean Rec.601 luma in [0,1].
      * Non-image payloads (no registered reader claims the bytes) fall
      * back to the deterministic byte-derived fake.
      */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        var lumaSum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            lumaSum += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)) / 255.0
            x += 1
          }
          y += 1
        }
        (w, h, img.getColorModel.getNumComponents, lumaSum / (w.toLong * h))
      } else {
        // === STUB === byte-derived pseudo-dimensions for non-image payloads
        val h = bytes.foldLeft(1125899906842597L)((a, b) => 31 * a + b) & 0x7fffffffL
        val w = 64 + (h % 1024).toInt
        val ht = 64 + ((h / 1024) % 1024).toInt
        val brightness = (h % 255).toDouble / 255.0
        (w, ht, 3, brightness)
      }
    }

    /** Fake resize: new payload is a deterministic function of the old. */
    def resize(bytes: Array[Byte], maxDim: Int): Array[Byte] =
      bytes.take(math.max(16, math.min(bytes.length, maxDim)))

    /** Fake frame decode at a timestamp. */
    def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte] = {
      val off = (tsMs % math.max(1, bytes.length)).toInt
      bytes.slice(off, math.min(bytes.length, off + 16))
    }

    /** Fake feature vector: rolling-hash lanes, L2-normalized. */
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val acc = new Array[Double](dim)
      var h = 7L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        acc(i % dim) += (h & 0xffL).toDouble
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      if (norm == 0) acc else acc.map(_ / norm)
    }
  }

  /** Wrap any table with (id, payload) into the media convention. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, kind: String, mime: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).cast("binary").as("content"),
      struct(lit(kind).as("kind"), lit(mime).as("mimeType"),
        length(col(binCol).cast("binary")).cast("long").as("sizeBytes")).as("meta"))
      .as[MediaRecord]
  }

  /** Decode metadata for every record — codec built once per partition. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] =
    media.mapPartitions { it =>
      val codec = new StubCodec // per-partition init (the expensive part in real codecs)
      it.map { r =>
        val (w, h, c, b) = codec.decode(r.content)
        DecodedImage(r.media_id, w, h, c, b)
      }
    }

  /** Resize payloads, preserving the media convention. */
  def resize(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] =
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map { r =>
        val out = codec.resize(r.content, maxDim)
        r.copy(content = out, meta = r.meta.copy(sizeBytes = out.length.toLong))
      }
    }

  /** Sample one frame every `everyMs` over `durationMs` — a typed
    * explode: one input row fans out to durationMs/everyMs frame rows.
    */
  def sampleFrames(media: Dataset[MediaRecord], durationMs: Long, everyMs: Long): Dataset[Frame] =
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { r =>
        (0L until durationMs by everyMs).zipWithIndex.map { case (ts, idx) =>
          Frame(r.media_id, idx, ts, codec.frameAt(r.content, ts))
        }
      }
    }

  /** Feature extraction to a fixed-dim embedding column, ready for
    * graft.operators.Similarity kernels.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map(r => MediaFeatures(r.media_id, dim, codec.features(r.content, dim)))
    }
}
