package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.DocGen

/** Multimodal column plumbing: media content as opaque `binary` payloads with
  * typed metadata, processed in batch inside `mapPartitions` (the Scala
  * analogue of mapInPandas batches).
  *
  * The DECODE STEP IS A STUB — image/audio codecs are not in this container
  * (see builder brief): `decodeStub` derives deterministic fake
  * width/height/frame/feature values from the payload bytes. Everything
  * around it — schema, binary column handling, partition batching, feature
  * array shape — is the real plumbing a codec would drop into.
  */
object Multimodal {

  final case class MediaRow(doc_id: String, media_ref: String, caption: String,
                            offset: Int, payload: Array[Byte])
  final case class MediaFeatures(doc_id: String, media_ref: String, width: Int,
                                 height: Int, n_frames: Int, feature: Array[Float])

  /** media spans → (doc, ref, caption, offset, payload). The payload is an
    * opaque binary stand-in (md5 bytes of the ref) — in production this is
    * the fetched object.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    DocGen.docs(spark, sfDir).toDF()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"),
        col("s.text").as("caption"), col("s.offset").as("offset"),
        unhex(md5(col("s.media_ref"))).as("payload"))

  /** The codec boundary AS A TYPE: a real pipeline passes an implementation
    * wrapping its image/audio/video libraries; everything on the Spark side
    * (binary column, mapPartitions batching, output schema) is independent of
    * which decoder rides the broadcast closure. Must be Serializable — one
    * instance is shipped to every task.
    */
  trait MediaDecoder extends Serializable {
    /** payload bytes → (width, height, n_frames, feature[8]) */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** STUB decoder — image/audio codecs are not in this container (builder
    * brief): deterministic pseudo-metadata + 8-dim feature vector from the
    * payload bytes. A production swap is `mediaFeatures(spark, dir, new
    * JpegDecoder)`, not an edit here.
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      def u(i: Int): Int = payload(i % payload.length) & 0xff
      val width = 64 + (u(0) << 2)
      val height = 64 + (u(1) << 2)
      val frames = 1 + u(2) % 32
      val feature = Array.tabulate(8)(i => (u(3 + i) - 128) / 128.0f)
      (width, height, frames, feature)
    }
  }

  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    StubDecoder.decode(payload)

  // --------------------------------------------------------- real PNG path

  /** REAL image decode via JDK ImageIO (zero external deps — PNG/BMP/GIF/JPEG
    * codecs ship with the JVM). The staged `media_png.parquet` table carries
    * actual PNG-encoded payloads (KgStage generates tiny deterministic images
    * and encodes them with `ImageIO.write` at stage time, recording the
    * expected (width, height, pixel_md5) from the RAW pixels before
    * encoding); the distributed query reads ONLY (media_ref, png), decodes
    * with `ImageIO.read` inside mapPartitions, and must reproduce the
    * expected metadata + pixel digest — PNG is lossless, so any decode error
    * breaks the hash.
    */
  object ImageCodec {

    /** cheap deterministic pixel mix (splitmix-style) — only the stage-time
      * GENERATOR uses it; the decode side never recomputes pixels
      */
    private def mix(seed: Long, x: Int, y: Int): Int = {
      var z = seed + (x * 0x9e3779b97f4a7c15L) + (y * 0xbf58476d1ce4e5b9L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffffff).toInt
    }

    /** tiny deterministic RGB image for a media ref (4..19 px per side) */
    def genImage(ref: String): java.awt.image.BufferedImage = {
      val seed = graft.core.Rng.streamKey(s"png#$ref")
      val w = 4 + (seed & 0xf).toInt
      val h = 4 + ((seed >>> 8) & 0xf).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, mix(seed, x, y))
      img
    }

    def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** md5 over the decoded RGB bytes in row-major order — the cross-path
      * pixel-equality witness (identical for the pre-encode and post-decode
      * image iff the codec round-trips losslessly)
      */
    def pixelMd5(img: java.awt.image.BufferedImage): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](3)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        buf(0) = ((rgb >> 16) & 0xff).toByte
        buf(1) = ((rgb >> 8) & 0xff).toByte
        buf(2) = (rgb & 0xff).toByte
        d.update(buf)
      }
      graft.kg.GoldRef.bytesToHex(d.digest())
    }

    final case class Decoded(width: Int, height: Int, pixel_md5: String)

    def decodePng(bytes: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "ImageIO could not decode payload")
      Decoded(img.getWidth, img.getHeight, pixelMd5(img))
    }
  }

  /** ImageIO-backed [[MediaDecoder]] — the production swap-in the stub's
    * scaladoc promises: payload bytes are a real encoded image; metadata and
    * an 8-dim feature (mean-centered red channel of the first 8 pixels) come
    * from actual pixel decoding.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageIO could not decode payload")
      val w = img.getWidth
      val h = img.getHeight
      val feature = Array.tabulate(8) { i =>
        val p = img.getRGB(i % w, (i / w) % h)
        (((p >> 16) & 0xff) - 128) / 128.0f
      }
      (w, h, 1, feature)
    }
  }

  final case class PngRow(media_ref: String, png: Array[Byte])
  final case class PngDecoded(media_ref: String, width: Int, height: Int, pixel_md5: String)

  /** Distributed PNG decode over the staged payload table: reads ONLY
    * (media_ref, png) — column pruning keeps the staged expectation columns
    * out of the scan — and emits real decoded metadata. The driver oracle
    * compares against the stage-time pre-encode values.
    */
  def decodePng(spark: SparkSession, pngTable: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(pngTable)
      .select(col("media_ref"), col("png")).as[PngRow]
      .mapPartitions(_.map { r =>
        val d = ImageCodec.decodePng(r.png)
        PngDecoded(r.media_ref, d.width, d.height, d.pixel_md5)
      }).toDF()
  }

  /** feature extraction over binary media columns — batched per partition. */
  def mediaFeatures(spark: SparkSession, sfDir: String,
                    decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val (w, h, f, feat) = decoder.decode(m.payload)
        MediaFeatures(m.doc_id, m.media_ref, w, h, f, feat)
      }
    }.toDF()
  }

  /** Resize plumbing: fit (width, height) inside a `maxSide` box preserving
    * aspect ratio — the metadata math a resize kernel needs, computed in
    * Catalyst (the pixel transform itself would live inside the same
    * mapPartitions the decode stub marks).
    */
  def resized(spark: SparkSession, sfDir: String, maxSide: Int = 128): DataFrame =
    mediaFeatures(spark, sfDir)
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("media_ref"), col("width"), col("height"),
        greatest(lit(1), round(col("width") * col("scale")).cast("int")).as("out_width"),
        greatest(lit(1), round(col("height") * col("scale")).cast("int")).as("out_height"),
        round(col("scale"), 6).as("scale"))

  /** Frame sampling: one row per sampled frame (every `stride`-th frame of
    * the stub's n_frames), with a deterministic per-frame payload ref. The
    * explode is the real plumbing — a video pipeline swaps the payload
    * derivation for actual frame bytes; row count stays ceil(n/stride) per
    * asset, so the fan-out is bounded and uniform.
    */
  def frameSamples(spark: SparkSession, sfDir: String, stride: Int = 4): DataFrame =
    mediaFeatures(spark, sfDir)
      .select(col("doc_id"), col("media_ref"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_ref",
        concat(col("media_ref"), lit("#f"), col("frame_idx")))
      .withColumn("frame_payload", unhex(md5(col("frame_ref"))))
}
