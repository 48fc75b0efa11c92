package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Round-9 operators: winnowing fingerprints and int8 quantization. */
class Round9Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("winnow_fingerprint: guarantee — docs sharing an 11+-char run share a fingerprint") {
    // winnowing with k=8, w=4 must select at least one common
    // fingerprint for any shared substring of length >= k + w - 1
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val shared = "the quick brown fox jumps over the lazy dog"
    Seq(
      (1L, s"alpha beta $shared gamma", "en", "a", 1L),
      (2L, s"$shared entirely different tail words here", "en", "a", 1L),
      (3L, "no overlap with anything else at all zzz", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val (fps, nWin) = Tables_winnowFps(dir)
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing a 43-char run have disjoint fingerprint sets")
    assert(fps(1L).intersect(fps(3L)).isEmpty,
      "unrelated docs share a fingerprint (hash collision in a 3-doc fixture is ~impossible)")
    // the r10 array-HOF production path must produce the SAME sets AND
    // the same per-doc full-window count as this independent
    // explode+window replica (the r9 construction) — n_windows is the
    // density denominator in winnow_fingerprint, so pinning only the
    // set contents would let the window-count semantics drift
    val (prod, prodWin) = try {
      import org.apache.spark.sql.functions._
      val t = CorpusOpsQueries.winnowDocTable(spark, dir)
        .select($"doc_id", $"n_windows", $"fps")
        .as[(Long, Long, Array[Long])].collect()
      (t.map { case (id, _, f) => id -> f.toSet }.toMap,
        t.map { case (id, n, _) => id -> n }.toMap)
    } finally LlmQueries.release(spark, dir, "winnow_fps")
    assert(prod == fps,
      s"array-HOF winnow sets diverge from the explode+window replica: $prod vs $fps")
    assert(prodWin == nWin,
      s"array-HOF n_windows diverges from the replica's full-window row counts: $prodWin vs $nWin")
  }

  private def Tables_winnowFps(
      dir: String): (Map[Long, Set[Long]], Map[Long, Long]) = {
    // an INDEPENDENT reference construction of the fingerprint sets:
    // explode to gram rows + doc-keyed window min (the r9 production
    // shape, kept here as a cross-implementation oracle for the
    // array-HOF build)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val k = 8; val w = 4
    val grams = graft.Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.TextFunctions.normText($"text").as("t"))
      .filter(length($"t") >= k + w - 1)
      .select($"doc_id",
        explode(sequence(lit(1), length($"t") - (k - 1))).as("p"), $"t")
      .select($"doc_id", $"p",
        conv(substring(md5($"t".substr($"p", lit(k))), 1, 8), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy($"doc_id").orderBy($"p").rowsBetween(-(w - 1), 0)
    val full = grams.withColumn("fp", min($"h").over(win)).filter($"p" >= w)
      .select($"doc_id", $"fp")
      .as[(Long, Long)].collect()
    (full.groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet },
      full.groupBy(_._1).map { case (id, rows) => id -> rows.length.toLong })
  }

  test("winnow_fingerprint: density in (0,1], fp bounds ordered, counts consistent") {
    val rows = SparkEntry.queries("winnow_fingerprint")(spark, sf)
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nw, nfp, density, fpMin, fpMax) =>
      assert(nfp >= 1 && nfp <= nw, s"doc $id: $nfp fps from $nw windows")
      assert(density > 0 && density <= 1.0, s"doc $id density $density")
      assert(fpMin <= fpMax, s"doc $id fp bounds")
    }
  }

  test("embedding_quantize: mse bounded by (scale/2)^2 and exact driver recompute") {
    val rows = SparkEntry.queries("embedding_quantize")(spark, sf)
      .as[(Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, nZero, mse) =>
      assert(scale >= 0, s"vec $id scale")
      // per-dim |err| <= scale/2 (round-to-nearest within range), so
      // mse <= (scale/2)^2 plus the 12dp snap slack
      assert(mse <= scale * scale / 4.0 + 1e-10, s"vec $id mse $mse vs scale $scale")
      assert(nZero >= 0 && nZero <= 64, s"vec $id n_zero $nZero")
    }
    // exact recompute for a sample of vectors
    val sample = graft.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val got = rows.filter(_._1 < 5).map(r => r._1 -> r).toMap
    def rnd(x: Double, n: Int): Double = {
      val s = math.pow(10, n); math.floor(x * s + 0.5) / s
    }
    sample.foreach { case (id, emb) =>
      val x = emb.map(_.toDouble)
      val scale = x.map(math.abs).max / 127.0
      val q = x.map(v => if (scale == 0) 0.0
        else math.max(-127.0, math.min(127.0, math.floor(v / scale + 0.5))))
      val sqs = x.zip(q).map { case (v, qv) =>
        BigDecimal(rnd((v - qv * scale) * (v - qv * scale), 12)) }
      val mse = rnd((sqs.sum / BigDecimal(x.length)).toDouble, 10)
      val (_, gScale, gZero, gMse) = got(id)
      assert(gScale == rnd(scale, 8), s"vec $id scale")
      assert(gZero == q.count(_ == 0.0), s"vec $id n_zero")
      assert(math.abs(gMse - mse) < 2e-10, s"vec $id mse $gMse vs $mse")
    }
  }
}
