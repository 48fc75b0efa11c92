package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row produced by the decode stage.
  * `decoded` distinguishes a real codec parse (width/height/channels
  * read from the media header and pixel layout) from the
  * deterministic fallback used for payloads no installed reader
  * recognizes.
  */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Int,
    height: Int,
    channels: Int,
    format: String,
    decoded: Boolean)

/** Multimodal-column plumbing (north star): media payloads travel as
  * opaque `binary` columns with typed metadata alongside; decode /
  * feature-extract runs per-partition in batches so codec init
  * amortizes per partition, not per row.
  *
  * The image path is REAL: `javax.imageio` (in the JDK — PNG, JPEG,
  * GIF, BMP readers ship with every JRE) parses the payload, and
  * width / height / channel-count / format come from the decoded
  * image, resize re-encodes through a Graphics2D scale, and feature
  * extraction histograms actual pixel luminance. Payloads no
  * installed reader recognizes (this library also moves audio/video
  * blobs whose codecs are NOT in the JDK, and the corpus fixtures
  * stand text bytes in for media) fall back to a deterministic
  * byte-derived fake, flagged `decoded = false`, so a mixed-media
  * column never kills the job and the audit can count undecodables
  * per batch.
  */
object Multimodal {

  /** Real image decode via javax.imageio: format name from the
    * registered reader that claims the byte stream, dimensions and
    * channel count from the decoded raster. Returns None when no
    * reader recognizes the payload (not an image, or a codec outside
    * the JDK). ImageIO's disk cache is disabled — executor-side
    * decode must not write temp files per row.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = r.read(0)
          Some((img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, fmt))
        } catch {
          // a recognized header with truncated/corrupt pixel data:
          // undecodable, same disposition as an unknown format
          case _: java.io.IOException => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Fallback decode for payloads no reader recognizes: deterministic
    * pseudo-dimensions from the payload bytes (flagged decoded=false
    * by [[extractMeta]]).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    val fmt = (n % 3: @unchecked) match {
      case 0 => "png"; case 1 => "jpg"; case 2 => "webp"
    }
    (n % 640 + 1, n % 480 + 1, fmt)
  }

  /** Attach a binary payload column to a text corpus (here: utf-8
    * bytes standing in for media blobs).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Media-file ingestion through Spark's `binaryFile` source: each
    * file becomes one row (path, modificationTime, length, content) —
    * the distributed front door for a directory of images/audio on
    * any Hadoop-supported filesystem. Executors read the bytes; the
    * driver only lists. `maxBytesPerFile` guards against a stray
    * multi-GB video materializing one row that no executor can hold —
    * oversized files FAIL the read loudly (a silent skip would
    * under-count the corpus).
    *
    * Output: (media_path, payload) + the stat columns, ready for
    * [[extractMeta]] / [[extractFeatures]] / [[resizeAll]].
    */
  def readMediaDir(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*",
      maxBytesPerFile: Long = 256L * 1024 * 1024): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
    val guarded = raw.withColumn("payload",
      when(col("length") <= maxBytesPerFile, col("content"))
        .otherwise(raise_error(concat(
          lit(s"media file exceeds maxBytesPerFile=$maxBytesPerFile: "), col("path")))))
    guarded.select(col("path").as("media_path"), col("modificationTime"),
      col("length").as("n_bytes"), col("payload"))
  }

  /** Real pixel features from a decoded image: a `dim`-bin luminance
    * histogram, L1-normalized — deterministic, fixed-dimension, and
    * invariant to image size, the contract downstream ANN operators
    * need. Luminance uses the Rec.601 integer weights over the RGB
    * returned by BufferedImage.getRGB, so the value is identical
    * whatever the source pixel layout was.
    */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val hist = new Array[Long](dim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        hist((lum * dim) / 256) += 1
        x += 1
      }
      y += 1
    }
    val total = math.max(1L, w.toLong * h)
    hist.map(c => (c.toDouble / total).toFloat)
  }

  /** Fallback feature extraction for undecodable payloads:
    * deterministic pseudo-embedding from the bytes. Fixed output
    * dimension, independent of input size.
    */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      graft.functions.Hashing.md5UnitFloat(md, s"$i:".getBytes("UTF-8") ++ bytes)
    }
  }

  /** Real resize: decode, Graphics2D bilinear scale to (w, h), PNG
    * re-encode. Headless-safe (BufferedImage + its own Graphics2D,
    * no display surface involved).
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    javax.imageio.ImageIO.setUseCache(false)
    val src =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    src.map { img =>
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Fallback resize for undecodable payloads: truncate/pad to a size
    * proportional to the target area so output sizes are plausible.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 4)
    if (bytes.length >= target) bytes.take(target)
    else bytes ++ Array.fill[Byte](target - bytes.length)(0)
  }

  /** Feature-extraction stage: (doc_id, payload) → (doc_id, embedding)
    * in per-partition batches — one codec/encoder init per partition,
    * rows streamed through it. Decodable images embed as pixel
    * luminance histograms ([[imageFeatures]]); other payloads get the
    * deterministic fallback. Output matches the `embeddings` table
    * shape so the ANN queries (cosine_topk, knn_*) compose directly.
    */
  def extractFeatures(withPayloadDf: DataFrame, dim: Int = 16): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        iter.map { case (id, bytes) =>
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: java.io.IOException => None }
          (id, img.map(imageFeatures(_, dim)).getOrElse(featureStub(bytes, dim)))
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** Resize stage: binary → binary, partition-preserving. Real decode
    * + scale + PNG re-encode for images, deterministic fallback for
    * undecodable payloads.
    */
  def resizeAll(withPayloadDf: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        iter.map { case (id, bytes) =>
          (id, resizeImage(bytes, w, h).getOrElse(resizeStub(bytes, w, h)))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Batch decode: mapPartitions over (doc_id, payload) so codec
    * setup happens once per partition. Real javax.imageio parse where
    * a reader claims the payload (decoded = true, channel count from
    * the color model); deterministic fallback otherwise. Returns a
    * typed Dataset.
    */
  def extractMeta(withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition
        val md = java.security.MessageDigest.getInstance("MD5")
        iter.map { case (id, bytes) =>
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          md.reset()
          decodeImage(bytes) match {
            case Some((w, h, ch, fmt)) =>
              MediaMeta(id, bytes.length.toLong, sum, w, h, ch, fmt, decoded = true)
            case None =>
              val (w, h, fmt) = decodeStub(bytes)
              MediaMeta(id, bytes.length.toLong, sum, w, h, 0, fmt, decoded = false)
          }
        }
      }
  }
}
