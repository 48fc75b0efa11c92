package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("payload column + batch metadata extraction round-trips") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val meta = Multimodal.extractMeta(Multimodal.withPayload(docs))
    assert(meta.count() == 50)
    val joined = meta.toDF().join(docs, Seq("doc_id"))
    // text bytes are not an image: no reader claims them, so every row
    // takes the deterministic fallback and is flagged undecoded
    assert(meta.filter($"decoded").count() == 0)
    assert(joined.filter($"n_bytes" =!= octet_length($"text")).count() == 0)
    assert(joined.filter($"checksum" =!= md5($"text".cast("binary"))).count() == 0)
    val m = meta.filter($"doc_id" === 0).head()
    assert(m.width == (m.n_bytes % 640 + 1) && m.height == (m.n_bytes % 480 + 1))
  }

  // -- real codec path ----------------------------------------------------

  private def gradientImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) |
        ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real PNG/JPEG bytes decode to real dimensions, channels, and format") {
    val png = encode(gradientImage(32, 20), "png")
    val jpg = encode(gradientImage(48, 16), "jpg")
    val junk = Array.tabulate[Byte](999)(i => (i * 7 % 256).toByte)
    val payload = Seq((1L, png), (2L, jpg), (3L, junk)).toDF("doc_id", "payload")
    val meta = Multimodal.extractMeta(payload).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).decoded && meta(1L).width == 32 && meta(1L).height == 20)
    assert(meta(1L).channels == 3 && meta(1L).format == "png")
    assert(meta(2L).decoded && meta(2L).width == 48 && meta(2L).height == 16)
    assert(meta(2L).channels == 3 && meta(2L).format.startsWith("jp"))
    assert(!meta(3L).decoded && meta(3L).channels == 0)

    // resize really rescales: output re-decodes at the target size
    val resized = Multimodal.resizeAll(payload, 10, 8)
      .as[(Long, Array[Byte])].collect().toMap
    for (id <- Seq(1L, 2L)) {
      val out = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resized(id)))
      assert(out.getWidth == 10 && out.getHeight == 8, s"doc $id")
    }
    // undecodable payload falls back to the byte-level stub
    assert(resized(3L).length == 10 * 8 / 4)

    // features histogram REAL pixels: a uniform black image puts all
    // mass in bin 0, and every histogram is a probability vector
    val black = encode(new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
    val feats = Multimodal.extractFeatures(
      Seq((1L, png), (4L, black)).toDF("doc_id", "payload"), dim = 16)
      .as[(Long, Array[Float])].collect().toMap
    assert(feats(4L)(0) == 1.0f && feats(4L).drop(1).forall(_ == 0.0f))
    assert(math.abs(feats(1L).map(_.toDouble).sum - 1.0) < 1e-6)
    assert(feats(1L).count(_ > 0f) > 1, "gradient should spread across bins")
  }

  test("feature extraction yields fixed-dim deterministic embeddings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val payload = Multimodal.withPayload(docs)
    val emb = Multimodal.extractFeatures(payload, dim = 16)
    assert(emb.count() == 50)
    val dims = emb.select(size($"embedding")).distinct().as[Int].collect()
    assert(dims.toSeq == Seq(16))
    // deterministic: same input → identical vectors across runs
    val a = emb.orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    val b = Multimodal.extractFeatures(payload, dim = 16)
      .orderBy($"doc_id").as[(Long, Seq[Float])].collect()
    assert(a.sameElements(b))
    // values land in [0,1) (stub contract)
    assert(emb.select(explode($"embedding").as("v"))
      .filter($"v" < 0.0f || $"v" >= 1.0f).count() == 0)
    // composes with the ANN surface: cosine against itself is 1
    graft.plans.VecFunctions.register(spark)
    val selfCos = emb.select(
      (graft.plans.VecFunctions.vecDot($"embedding", $"embedding")
        / (sqrt(graft.plans.VecFunctions.vecDot($"embedding", $"embedding"))
          * sqrt(graft.plans.VecFunctions.vecDot($"embedding", $"embedding")))).as("c"))
    assert(selfCos.filter(abs($"c" - 1.0) > 1e-6).count() == 0)
  }

  test("binaryFile ingestion: files become payload rows, stages compose, size guard trips") {
    val dir = tmpDir("media")
    val payloads = (0 until 12).map { i =>
      val bytes = Array.tabulate[Byte](100 + 37 * i)(j => ((i * 31 + j) % 256).toByte)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/img_$i.bin"), bytes)
      s"img_$i.bin" -> bytes
    }.toMap
    java.nio.file.Files.writeString( // non-matching extension: excluded by glob
      java.nio.file.Paths.get(s"$dir/notes.txt"), "not media")

    val media = Multimodal.readMediaDir(spark, dir, glob = "*.bin")
    assert(media.count() == 12)
    // executor-read bytes match what was written, per file
    val back = media.select($"media_path", $"payload")
      .as[(String, Array[Byte])].collect()
      .map { case (p, b) => p.split('/').last -> b }.toMap
    assert(back.keySet == payloads.keySet)
    assert(back.forall { case (k, b) => b.sameElements(payloads(k)) })
    // composes with the decode stage (keyed by a derived doc_id)
    val meta = Multimodal.extractMeta(
      media.withColumn("doc_id", crc32($"media_path").cast("long")))
    assert(meta.count() == 12)
    // the size guard fails LOUDLY instead of silently skipping — it
    // lives on the payload column, so it fires exactly when payload
    // bytes are materialized (a pruned metadata-only read is safe and
    // correctly skips it; count() alone would never touch the bytes)
    val e = intercept[Exception] {
      Multimodal.readMediaDir(spark, dir, glob = "*.bin", maxBytesPerFile = 150)
        .select(md5($"payload")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBytesPerFile")))
  }

  test("resize stage is partition-preserving and sizes track target area") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val payload = Multimodal.withPayload(docs).repartition(4)
    val resized = Multimodal.resizeAll(payload, 64, 64)
    assert(resized.rdd.getNumPartitions == 4) // no shuffle introduced
    val sizes = resized.select(octet_length($"payload")).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(64 * 64 / 4))
  }
}
