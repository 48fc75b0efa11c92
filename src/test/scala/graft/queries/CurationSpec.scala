package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Twelfth-wave dataset-assembly operators. Where a query and its
  * DuckDB oracle could share a semantics bug (the round-9 BPE lesson),
  * these tests recompute expectations DRIVER-SIDE from first
  * principles — an independent arbiter, not a third copy of the same
  * expression tree.
  */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- split_assign ------------------------------------------------

  test("split_assign: buckets match a driver-side MessageDigest recompute") {
    // independent arbiter: java.security MD5 over the same key string,
    // first 4 bytes as the unsigned 32-bit bucket source
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(id: Long): String = {
      val h = md.digest(s"split:$id".getBytes("UTF-8"))
      val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
        ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
      val b = v % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val expected = docs.groupBy { case (id, lang) => (splitOf(id), lang) }
      .map { case (k, rows) => k -> rows.size.toLong }
    val got = SparkEntry.queries("split_assign")(spark, sf)
      .select($"split", $"lang", $"n_docs")
      .as[(String, String, Long)].collect()
      .map { case (s_, l, n) => (s_, l) -> n }.toMap
    assert(got == expected)
  }

  test("split_assign: assignment is a pure function of doc_id (stable under resplit)") {
    val a = SparkEntry.queries("split_assign")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("split_assign")(spark, sf).collect().toSeq
    assert(a == b)
  }

  // ---- domain_cap --------------------------------------------------

  test("domain_cap: WindowGroupLimit prunes map-side; groups capped at K") {
    val df = SparkEntry.queries("domain_cap")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // rank<=K runs BEFORE the exchange: a dominant source ships K rows
    // per input partition, not its whole corpus slice
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    val perSource = df.groupBy("source").count().as[(String, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, n) => assert(n <= 25, s"$src kept $n > K") }
  }

  test("domain_cap: keeps exactly the K longest per source (driver recompute)") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"doc_id",
        graft.functions.TextFunctions.nTokens($"text").cast("long").as("n"))
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, n) => (-n, id) }.take(25).toSeq.map(r => (src, r._2))
    }.toSet
    val got = SparkEntry.queries("domain_cap")(spark, sf)
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  // ---- junk_detect -------------------------------------------------

  test("junk_detect: repeated-char doc flags junk, diverse doc does not") {
    val dir = tmpDir("junk")
    Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaa aaaaaaaa", "en", "a", 33L),
      (2L, "the quick brown fox jumps over a lazy dog 0123456789", "en", "a", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("junk_detect")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._6, "repeated-char doc not flagged junk")
    assert(!rows(2L)._6, "diverse doc wrongly flagged junk")
    rows.values.foreach { case (id, n, nd, top, gini, _) =>
      assert(top > 0 && top <= 1.0, s"doc $id top_char_frac $top")
      assert(gini > 0 && gini <= 1.0, s"doc $id gini $gini")
      assert(nd >= 1 && nd <= n)
    }
    // doc 1: 32 a's + 1 space → top = 32/33, gini = (32/33)² + (1/33)²
    val g1 = rows(1L)
    assert(math.abs(g1._4 - 32.0 / 33.0) < 1e-12)
    assert(math.abs(g1._5 - (math.pow(32.0 / 33, 2) + math.pow(1.0 / 33, 2))) < 1e-9)
  }

  // ---- line_dedup --------------------------------------------------

  test("line_dedup: constructed boilerplate doc measures its repeated segments") {
    val dir = tmpDir("linededup")
    Seq(
      // 4 segments after '. ' split; 'accept cookies' repeated 3×
      (1L, "Accept cookies. accept cookies. ACCEPT COOKIES. real content here", "en", "a", 1L),
      (2L, "one segment only no period splits", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("line_dedup")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._2 == 4L && rows(1L)._3 == 2L)
    assert(math.abs(rows(1L)._4 - 0.5) < 1e-12)
    assert(rows(2L)._2 == 1L && rows(2L)._4 == 0.0)
  }

  // ---- length_filter_sweep ----------------------------------------

  test("length_filter_sweep: retention monotone non-increasing in threshold") {
    val rows = SparkEntry.queries("length_filter_sweep")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L, 128L, 256L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"docs_retained rose ${a._1}→${b._1}")
      assert(a._3 >= b._3, s"tok_retained rose ${a._1}→${b._1}")
    }
    rows.foreach { r =>
      assert(r._4 >= 0 && r._4 <= 1.0); assert(r._5 >= 0 && r._5 <= 1.0)
    }
  }

  // ---- source_reliability -----------------------------------------

  test("source_reliability: wilson lower bound is a lower bound, in [0,1]") {
    val rows = SparkEntry.queries("source_reliability")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, np, rate, lb) =>
      assert(np <= n)
      assert(lb >= 0.0 && lb <= 1.0, s"$src wilson $lb")
      assert(lb <= rate + 1e-9, s"$src wilson $lb above rate $rate")
    }
    // sorted by wilson desc
    assert(rows.map(_._5).toSeq == rows.map(_._5).sortBy(-_).toSeq)
  }

  test("source_reliability: small sample discounted below large sample at same rate") {
    val dir = tmpDir("wilson")
    // both sources 100% pass; 'big' has 40 docs, 'tiny' has 2
    val good = "the cat sat on the mat and then ran away quickly"
    val docs = (1 to 40).map(i => (i.toLong, good, "en", "big", 10L)) ++
      Seq((100L, good, "en", "tiny", 10L), (101L, good, "en", "tiny", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("source_reliability")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(rows("big") > rows("tiny"),
      s"large sample ${rows("big")} not ranked above small ${rows("tiny")}")
  }

  // ---- audio_rms ---------------------------------------------------

  test("audio_rms: codec round-trip reproduces the closed-form signal exactly") {
    // independent arbiter: recompute every window energy driver-side
    // from the amp formula — the Spark path must agree through a REAL
    // WAV encode + decode
    val got = SparkEntry.queries("audio_rms")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nSamp, rate, ch, nWin, total, maxW) =>
      val n = 800 + java.lang.Math.floorMod(id, 5L).toInt * 160
      assert(nSamp == n.toLong, s"doc $id samples")
      assert(rate == 16000L && ch == 1L, s"doc $id decoded format")
      val ssqs = (0 until n).grouped(160).map { w =>
        w.map { i =>
          val a = java.lang.Math.floorMod(id * 31 + i.toLong * 17, 2003L) - 1001L
          a * a
        }.sum
      }.toSeq
      assert(nWin == ssqs.size.toLong)
      assert(total == ssqs.sum, s"doc $id total_ssq")
      assert(maxW == ssqs.max, s"doc $id max_window_ssq")
    }
  }

  // ---- changepoint_cusum ------------------------------------------

  test("changepoint_cusum: detects a constructed step change at the right hour") {
    val dir = tmpDir("cusum")
    // 48 hourly events: value 10 for hours 0..23, 50 for hours 24..47
    // → |S_i| peaks at the step boundary
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:30:00").getTime
    val rows = (0 until 48).map { h =>
      (h.toLong, new java.sql.Timestamp(t0 + h * 3600000L), h.toLong % 7,
        "step", if (h < 24) 10.0 else 50.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("changepoint_cusum")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (_, nHours, cpHr, stat) = out.head
    assert(nHours == 48L)
    // peak deviation is at the last pre-step hour (hour index 23)
    val expectHr = (t0 - t0 % 3600000L) + 23 * 3600000L
    assert(cpHr == expectHr, s"cp at $cpHr, expected $expectHr")
    // |S_23| = 24·|10 − 30| = 480
    assert(math.abs(stat - 480.0) < 1e-6, s"stat $stat")
  }
}
