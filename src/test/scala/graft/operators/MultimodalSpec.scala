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
}
