package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema of the media convention, determinism of
  * the stubbed codec across partitionings, explode fan-out shape, and
  * feature vectors feeding the similarity kernels.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def media = Multimodal.asMedia(
    Tables.load(spark, sf, "documents"), "doc_id", "text", "image", "image/fake")

  test("asMedia: binary payload + typed metadata struct") {
    val df = media.toDF()
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val r = media.head()
    assert(r.meta.sizeBytes == r.content.length.toLong && r.meta.kind == "image")
  }

  test("decodeImages really decodes a PNG: true dimensions, channels, luma") {
    import java.awt.image.BufferedImage
    // 3x2: top row white, bottom row black → mean Rec.601 luma = 0.5
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3) { img.setRGB(x, 0, 0xffffff); img.setRGB(x, 1, 0x000000) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val media = Multimodal.asMedia(df, "doc_id", "payload", "image", "image/png")
    val d = Multimodal.decodeImages(media).head()
    assert(d.width == 3 && d.height == 2 && d.channels == 3)
    assert(math.abs(d.brightness - 0.5) < 1e-6)
  }

  test("asMedia drops a malformed STRING id instead of throwing under ANSI (P5 contract)") {
    val df = Seq(("7", Array[Byte](1, 2)), ("not-a-number", Array[Byte](3)),
      (null.asInstanceOf[String], Array[Byte](4)))
      .toDF("doc_id", "payload")
    val m = Multimodal.asMedia(df, "doc_id", "payload", "image", "image/png").collect()
    assert(m.map(_.media_id).toSeq === Seq(7L)) // malformed + NULL both dropped
  }

  test("decodeImages is deterministic and partition-count independent") {
    val a = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImages(media.repartition(13)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(d => d.width >= 64 && d.height >= 64 && d.brightness >= 0 && d.brightness <= 1))
  }

  test("resize shrinks payload and keeps sizeBytes consistent") {
    val out = Multimodal.resize(media, maxDim = 32).collect()
    assert(out.forall(r => r.content.length <= 32 || r.content.length == 16))
    assert(out.forall(r => r.meta.sizeBytes == r.content.length.toLong))
  }

  test("resize really rescales a PNG: re-decoded dims honor maxDim and aspect") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(64, 16, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 64; y <- 0 until 16) img.setRGB(x, y, 0x4080c0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val m = Multimodal.asMedia(df, "doc_id", "payload", "image", "image/png")
    val r = Multimodal.resize(m, maxDim = 16).head()
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
    assert(back.getWidth == 16 && back.getHeight == 4) // 64x16 -> /4, aspect kept
    assert(back.getRGB(8, 2) == 0xff4080c0.toInt) // solid color survives the scale
    // never upscales: a tiny image passes through at original dims
    val small = Multimodal.resize(m, maxDim = 1000).head()
    val b2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small.content))
    assert(b2.getWidth == 64 && b2.getHeight == 16)
  }

  test("decodeAudios really decodes a WAV: rate, channels, frames, duration, RMS") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 1000 frames of a full-scale square wave at 8 kHz mono 16-bit -> RMS ~ 1.0
    val pcm = new Array[Byte](2000)
    for (i <- 0 until 1000) {
      val v = if (i % 2 == 0) 32767 else -32767
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 1000), AudioFileFormat.Type.WAVE, bos)
    val df = Seq((7L, bos.toByteArray)).toDF("doc_id", "payload")
    val m = Multimodal.asMedia(df, "doc_id", "payload", "audio", "audio/wav")
    val a = Multimodal.decodeAudios(m).head()
    assert(a.media_id == 7L && a.sample_rate == 8000.0 && a.channels == 1)
    assert(a.n_frames == 1000L && math.abs(a.duration_ms - 125.0) < 1e-9)
    assert(math.abs(a.rms - 1.0) < 1e-3)
  }

  test("decodeAudios falls back deterministically on non-audio payloads") {
    val a = Multimodal.decodeAudios(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAudios(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(d => d.sample_rate >= 8000.0 && d.channels >= 1 && d.rms >= 0 && d.rms <= 1))
  }

  test("sampleFrames fans out one row per sampled timestamp") {
    val n = media.count()
    val frames = Multimodal.sampleFrames(media, durationMs = 1000, everyMs = 250)
    assert(frames.count() == n * 4)
    val byId = frames.filter($"media_id" === 0).orderBy($"frame_idx").collect()
    assert(byId.map(_.ts_ms).toSeq == Seq(0L, 250L, 500L, 750L))
  }

  test("sampleFrames really extracts animated-GIF frames by display time") {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    // two 4x4 frames — solid red then solid blue — each displayed 100 ms
    def solid(rgb: Int) = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, rgb)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (img <- Seq(solid(0xff0000), solid(0x0000ff))) {
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10") // centiseconds -> 100 ms
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    val df = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val m = Multimodal.asMedia(df, "doc_id", "payload", "video", "image/gif")
    // ticks 0 and 100 ms land on frame 0 (red) and frame 1 (blue)
    val frames = Multimodal.sampleFrames(m, durationMs = 200, everyMs = 100)
      .orderBy($"frame_idx").collect()
    assert(frames.length == 2)
    val decoded = frames.map(f =>
      ImageIO.read(new java.io.ByteArrayInputStream(f.frame)))
    assert(decoded.forall(i => i != null && i.getWidth == 4 && i.getHeight == 4))
    assert((decoded(0).getRGB(2, 2) & 0xffffff) == 0xff0000)
    assert((decoded(1).getRGB(2, 2) & 0xffffff) == 0x0000ff)
  }

  test("sampleFrames really extracts MJPEG-AVI frames via the RIFF walk") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // two 4x4 frames — solid red then solid blue — at 40 ms/frame
    def solid(rgb: Int) = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, rgb)
      img
    }
    def jpeg(img: BufferedImage) = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def lst(typ: String, body: Array[Byte]) =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val hdrl = lst("hdrl", chunk("avih", le32(40000L) ++ Array.fill[Byte](52)(0)))
    val movi = lst("movi",
      chunk("00dc", jpeg(solid(0xff0000))) ++ chunk("00dc", jpeg(solid(0x0000ff))))
    val payload = hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(4L + payload.length) ++
      "AVI ".getBytes("US-ASCII") ++ payload

    val df = Seq((11L, avi)).toDF("doc_id", "payload")
    val m = Multimodal.asMedia(df, "doc_id", "payload", "video", "video/x-msvideo")
    // ticks 0 and 40 ms land on frame 0 (red) and frame 1 (blue)
    val frames = Multimodal.sampleFrames(m, durationMs = 80, everyMs = 40)
      .orderBy($"frame_idx").collect()
    assert(frames.length == 2)
    val decoded = frames.map(f => ImageIO.read(new java.io.ByteArrayInputStream(f.frame)))
    assert(decoded.forall(i => i != null && i.getWidth == 4 && i.getHeight == 4))
    def rgb(i: BufferedImage) = { val v = i.getRGB(2, 2); ((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff) }
    val (r0, g0, b0) = rgb(decoded(0))
    val (r1, g1, b1) = rgb(decoded(1))
    // JPEG is lossy: assert channel dominance, not exact values
    assert(r0 > 180 && g0 < 100 && b0 < 100, s"frame0 not red: ($r0,$g0,$b0)")
    assert(b1 > 180 && r1 < 100 && g1 < 100, s"frame1 not blue: ($r1,$g1,$b1)")
    // malformed RIFF payloads fall back to null (→ labeled fake), never throw
    assert(new Multimodal.StubCodec().aviFrames("RIFF????AVI garbage".getBytes("US-ASCII")) == null)
  }

  test("extractFeatures yields unit-norm vectors usable by Similarity") {
    val feats = Multimodal.extractFeatures(media, dim = 16)
    val norms = feats.select($"media_id",
      sqrt(aggregate(transform($"features", x => x * x),
        lit(0.0), (acc, z) => acc + z)).as("n2"))
      .collect()
    assert(norms.forall(r => math.abs(r.getAs[Double]("n2") - 1.0) < 1e-9))
    // plumb into the cosine kernel: features as embedding column
    val emb = feats.select($"media_id".as("vec_id"),
      transform($"features", x => x.cast("float")).as("embedding"))
    val topk = graft.operators.Similarity.cosineTopK(emb, nQueries = 3, k = 2)
    assert(topk.count() == 6)
  }
}
