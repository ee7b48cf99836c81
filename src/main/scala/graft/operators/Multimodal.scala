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
  * Codec status: the IMAGE decode AND resize paths are REAL —
  * `javax.imageio` (JDK built-in, no external dependency) decodes
  * PNG/JPEG/GIF/BMP payloads to true width/height/channels plus
  * average luminance, and resize renders through a Graphics2D
  * bilinear scale and re-encodes as PNG. The AUDIO decode path is
  * REAL for WAV/AIFF — `javax.sound.sampled` (also JDK built-in)
  * yields true sample rate, channel count, frame count, duration and
  * PCM RMS level. VIDEO frame extraction is REAL for animated GIF —
  * ImageIO iterates the frames and their GraphicControl delays — and
  * for MJPEG-in-AVI — a pure-JVM RIFF chunk walk feeds each frame
  * chunk's JPEG through the same ImageIO path — and [[sampleFrames]]
  * maps each sampled timestamp to the frame shown at that instant.
  * Payloads no installed reader recognizes (and learned features /
  * other video containers) fall back to the clearly-marked
  * deterministic fake, because this container ships no media codecs
  * beyond the JDK. Everything around the codec
  * — schemas, encoders, batch shape, explode semantics, partitioning
  * — is real and tested; swapping in a full codec touches only
  * [[StubCodec]].
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(kind: String, mimeType: String, sizeBytes: Long)
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Int, height: Int, channels: Int, brightness: Double)
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])
  final case class MediaFeatures(media_id: Long, dim: Int, features: Array[Double])
  final case class DecodedAudio(media_id: Long, sample_rate: Double, channels: Int,
                                n_frames: Long, duration_ms: Double, rms: Double)

  implicit val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val decodedEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val audioEnc: Encoder[DecodedAudio] = Encoders.product[DecodedAudio]

  /** The ONE byte-derived stub hash behind every deterministic fake —
    * the seed/fold/mask triple must stay identical across stub paths
    * or the "deterministic fake" contract silently diverges.
    */
  private def stubHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((a, b) => 31 * a + b) & 0x7fffffffL

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
        val h = stubHash(bytes)
        val w = 64 + (h % 1024).toInt
        val ht = 64 + ((h / 1024) % 1024).toInt
        val brightness = (h % 255).toDouble / 255.0
        (w, ht, 3, brightness)
      }
    }

    /** Resize image payloads for real: decode with ImageIO, scale the
      * long edge down to `maxDim` (aspect preserved, bilinear, never
      * upscales), re-encode as PNG. Non-image payloads keep the
      * deterministic byte-truncation fake.
      */
    def resize(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
        val (w, h) = (math.max(1, (img.getWidth * scale).round.toInt),
          math.max(1, (img.getHeight * scale).round.toInt))
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      } else
        // === STUB === non-image payloads: deterministic truncation
        bytes.take(math.max(16, math.min(bytes.length, maxDim)))
    }

    /** Decode audio payloads with the JDK's sampled-sound stack: true
      * format parameters and the RMS level of the 16-bit PCM frames.
      * Returns null for payloads no installed provider recognizes
      * (WAV/AIFF/AU ship with the JDK).
      */
    def decodeAudio(bytes: Array[Byte]): DecodedAudio = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        // AU headers may declare unknown length: getFrameLength = -1
        // would flow negative n_frames/duration into aggregates —
        // derive the count from the decoded bytes instead
        val declaredFrames = in.getFrameLength
        val data = in.readAllBytes()
        val nFrames =
          if (declaredFrames >= 0) declaredFrames
          else if (fmt.getFrameSize > 0) data.length.toLong / fmt.getFrameSize
          else 0L
        val durMs = nFrames * 1000.0 / fmt.getSampleRate
        var sumSq = 0.0
        var n = 0
        if (fmt.getSampleSizeInBits == 16) {
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          while (bb.remaining() >= 2) {
            val s = bb.getShort / 32768.0
            sumSq += s * s
            n += 1
          }
        } else if (fmt.getSampleSizeInBits == 8
            && (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
              || fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)) {
          // the per-byte branch is 8-BIT ONLY: letting 24/32-bit PCM
          // fall in here would score each byte of a sample as an
          // independent 8-bit sample — a silently-garbage RMS. Sample
          // sizes this decoder does not handle report rms_level = 0
          // with n = 0 (honest "not measured"), like non-PCM codings.
          data.foreach { b =>
            val s = (if (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
              ((b & 0xff) - 128) else b.toInt) / 128.0
            sumSq += s * s
            n += 1
          }
        }
        DecodedAudio(0L, fmt.getSampleRate.toDouble, fmt.getChannels,
          nFrames, durMs, if (n == 0) 0.0 else math.sqrt(sumSq / n))
      } catch { case _: Exception => null }
    }

    /** REAL multi-frame decode for animated GIF — the one video-like
      * format the JDK can iterate without external codecs. Returns
      * every frame as (endMs, png): `endMs` is the cumulative display
      * timeline built from each frame's GraphicControlExtension
      * delayTime (centiseconds; 0 → the de-facto 100 ms default), and
      * the pixels are the frame re-encoded as PNG. Frames are decoded
      * per-index without disposal-method compositing (full-frame GIFs
      * round-trip exactly; partial-update GIFs yield the delta image).
      * Returns null when no GIF reader claims the bytes or the payload
      * has a single frame.
      */
    def gifFrames(bytes: Array[Byte]): Array[(Long, Array[Byte])] = {
      val iis =
        try javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (iis == null) return null
      var reader: javax.imageio.ImageReader = null
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        reader = readers.next()
        if (!reader.getFormatName.equalsIgnoreCase("gif")) return null
        reader.setInput(iis, false, false)
        val n = reader.getNumImages(true)
        if (n < 2) return null
        var tl = 0L
        val out = new Array[(Long, Array[Byte])](n)
        var i = 0
        while (i < n) {
          val img = reader.read(i)
          val meta = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val gce = meta.getElementsByTagName("GraphicControlExtension")
          val delayCs =
            if (gce.getLength > 0)
              gce.item(0).asInstanceOf[org.w3c.dom.Element]
                .getAttribute("delayTime").toIntOption.getOrElse(0)
            else 0
          tl += (if (delayCs <= 0) 100L else delayCs * 10L)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          out(i) = (tl, bos.toByteArray)
          i += 1
        }
        out
      } catch { case _: Exception => null }
      finally {
        // dispose/close must not fail the task: a malformed payload's
        // contract is the null → stub fallback, never an exception
        if (reader != null) try reader.dispose() catch { case _: Exception => () }
        try iis.close() catch { case _: Exception => () }
      }
    }

    /** The frame displayed at `tsMs` on the looping GIF timeline. */
    def frameActiveAt(frames: Array[(Long, Array[Byte])], tsMs: Long): Array[Byte] = {
      val t = tsMs % frames.last._1
      frames.find(_._1 > t).getOrElse(frames.last)._2
    }

    /** Real frame extraction for MJPEG-in-AVI — the second true video
      * container beside animated GIF, decodable with zero non-JDK
      * dependencies: AVI is RIFF framing, and in motion-JPEG each
      * `##dc`/`##db` movi chunk is a complete JPEG the existing
      * ImageIO path decodes. The walker reads `avih`'s
      * dwMicroSecPerFrame for the timeline (0 → the 100 ms fallback
      * GIF also uses) and collects every JPEG-bearing frame chunk
      * (word-aligned, nested LISTs recursed). Returns the same
      * (cumulative display-end ms, PNG bytes) shape as [[gifFrames]],
      * or null when the payload is not a multi-frame MJPEG AVI.
      */
    def aviFrames(bytes: Array[Byte]): Array[(Long, Array[Byte])] = {
      def u32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      try {
        if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return null
        var frameMs = 100L
        val jpegs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = fourcc(off)
            val sz = u32(off + 4).toInt
            if (sz < 0 || off + 8 + sz > end) return // malformed size: stop cleanly
            if (id == "LIST") walk(off + 12, off + 8 + sz) // skip the list-type fourcc
            else if (id == "avih" && sz >= 4) {
              val usPerFrame = u32(off + 8)
              if (usPerFrame > 0) frameMs = math.max(1L, usPerFrame / 1000L)
            } else if (sz > 2 && (id.endsWith("dc") || id.endsWith("db")) &&
              bytes(off + 8) == 0xff.toByte && bytes(off + 9) == 0xd8.toByte) {
              jpegs += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
            }
            off += 8 + sz + (sz & 1) // chunks are word-aligned
          }
        }
        walk(12, math.min(bytes.length.toLong, 8L + u32(4)).toInt)
        if (jpegs.length < 2) return null
        var tl = 0L
        val out = new Array[(Long, Array[Byte])](jpegs.length)
        var i = 0
        while (i < jpegs.length) {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpegs(i)))
          if (img == null) return null
          tl += frameMs
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          out(i) = (tl, bos.toByteArray)
          i += 1
        }
        out
      } catch { case _: Exception => null }
    }

    /** Frames of any REAL container this codec can walk (animated GIF,
      * then MJPEG-AVI), or null → callers use the labeled fake.
      */
    def videoFrames(bytes: Array[Byte]): Array[(Long, Array[Byte])] = {
      val g = gifFrames(bytes)
      if (g != null) g else aviFrames(bytes)
    }

    /** === STUB === fake frame decode at a timestamp, for payloads in
      * formats this container has no codec for (MP4, WebM, ...).
      */
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
    // totality at the boundary: MediaRecord's fields are primitives, so
    // a NULL payload or un-castable id would fail typed deserialization
    // ("Null value appeared in non-nullable field") deep inside a task.
    // NULL content becomes an empty payload (the stub/codec paths
    // handle empty bytes — EdgeCaseSpec); a row whose id cannot key the
    // record is DROPPED, the reference's malformed-row contract (P5).
    // try_cast, not cast: under ANSI (this repo's default) a plain cast
    // THROWS on a malformed string id instead of nulling it, so the
    // isNotNull drop would never see it.
    df.select(
      expr(s"try_cast(`$idCol` AS LONG)").as("media_id"),
      coalesce(col(binCol).cast("binary"),
        lit(Array.emptyByteArray)).as("content"))
      .filter(col("media_id").isNotNull)
      .select(
        col("media_id"), col("content"),
        struct(lit(kind).as("kind"), lit(mime).as("mimeType"),
          // ansi-ok: length() is int, widening to long never raises
          length(col("content")).cast("long").as("sizeBytes")).as("meta"))
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

  /** Decode audio metadata + level for every record — real for
    * WAV/AIFF/AU via the JDK; unrecognized payloads get the
    * deterministic byte-derived fake so the operator stays total.
    */
  def decodeAudios(media: Dataset[MediaRecord]): Dataset[DecodedAudio] =
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map { r =>
        val real = codec.decodeAudio(r.content)
        if (real != null) real.copy(media_id = r.media_id)
        else {
          // === STUB === byte-derived fake for non-audio payloads
          val h = stubHash(r.content)
          DecodedAudio(r.media_id, 8000.0 + (h % 40000), 1 + (h % 2).toInt,
            h % 100000, (h % 100000) * 1000.0 / (8000.0 + (h % 40000)),
            (h % 1000) / 1000.0)
        }
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
    * REAL for animated GIF and MJPEG-in-AVI: the payload's frames are
    * decoded once per record (GraphicControl delays / avih frame
    * period) and each sampled timestamp receives the frame actually
    * displayed at that instant on the looping timeline, PNG-encoded.
    * Other payloads fall back to the clearly-marked deterministic
    * fake (no further video codec ships in this container).
    */
  def sampleFrames(media: Dataset[MediaRecord], durationMs: Long, everyMs: Long): Dataset[Frame] =
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { r =>
        val real = codec.videoFrames(r.content) // one decode per record, reused per tick
        (0L until durationMs by everyMs).zipWithIndex.map { case (ts, idx) =>
          val px = if (real != null) codec.frameActiveAt(real, ts)
                   else codec.frameAt(r.content, ts)
          Frame(r.media_id, idx, ts, px)
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
