package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row produced by the decode stage. */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    checksum: String,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing (north star): media payloads travel as
  * opaque `binary` columns with typed metadata alongside; decode /
  * feature-extract runs per-partition in batches so a real codec
  * (libjpeg, ffmpeg, …) would amortize init cost per partition, not
  * per row.
  *
  * The decode itself is a STUB — this container has no image/audio
  * libraries — implemented as a deterministic fake derived from the
  * bytes. Everything around it (schema, binary column handling,
  * partition-preserving batch iteration, typed output Dataset) is the
  * real production shape: swap `decodeStub` for a codec call and
  * nothing else changes.
  */
object Multimodal {

  /** STUB decode: deterministic pseudo-dimensions from the payload.
    * Real implementation would parse the media header here.
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

  /** STUB feature extraction: deterministic pseudo-embedding from the
    * payload (a real implementation would run a vision/audio encoder
    * on the decoded media). Fixed output dimension, unit-independent
    * of input size — the shape downstream ANN operators expect.
    */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      graft.functions.Hashing.md5UnitFloat(md, s"$i:".getBytes("UTF-8") ++ bytes)
    }
  }

  /** STUB resize: a real implementation would decode, scale to
    * (w, h), re-encode; the stub truncates/pads the payload to a size
    * proportional to the target area so output sizes are plausible.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 4)
    if (bytes.length >= target) bytes.take(target)
    else bytes ++ Array.fill[Byte](target - bytes.length)(0)
  }

  /** Feature-extraction stage: (doc_id, payload) → (doc_id, embedding)
    * in per-partition batches — one encoder init per partition, rows
    * streamed through it. Output matches the `embeddings` table shape
    * so the ANN queries (cosine_topk, knn_*) compose directly.
    */
  def extractFeatures(withPayloadDf: DataFrame, dim: Int = 16): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // encoder/model load would go here, once per partition
        iter.map { case (id, bytes) => (id, featureStub(bytes, dim)) }
      }
      .toDF("doc_id", "embedding")
  }

  /** Resize stage: binary → binary, partition-preserving. */
  def resizeAll(withPayloadDf: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // codec init once per partition
        iter.map { case (id, bytes) => (id, resizeStub(bytes, w, h)) }
      }
      .toDF("doc_id", "payload")
  }

  /** Batch decode: mapPartitions over (doc_id, payload) so codec
    * setup happens once per partition. Returns a typed Dataset.
    */
  def extractMeta(withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // codec init would go here, once per partition
        val md = java.security.MessageDigest.getInstance("MD5")
        iter.map { case (id, bytes) =>
          val (w, h, fmt) = decodeStub(bytes)
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          md.reset()
          MediaMeta(id, bytes.length.toLong, sum, w, h, fmt)
        }
      }
  }
}
