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

  test("resize stage is partition-preserving and sizes track target area") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val payload = Multimodal.withPayload(docs).repartition(4)
    val resized = Multimodal.resizeAll(payload, 64, 64)
    assert(resized.rdd.getNumPartitions == 4) // no shuffle introduced
    val sizes = resized.select(octet_length($"payload")).distinct().as[Int].collect()
    assert(sizes.toSeq == Seq(64 * 64 / 4))
  }
}
