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
    // stub decode is deterministic from byte length
    assert(joined.filter($"n_bytes" =!= octet_length($"text")).count() == 0)
    assert(joined.filter($"checksum" =!= md5($"text".cast("binary"))).count() == 0)
    val m = meta.filter($"doc_id" === 0).head()
    assert(m.width == (m.n_bytes % 640 + 1) && m.height == (m.n_bytes % 480 + 1))
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
