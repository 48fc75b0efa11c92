package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** Round-11 operators: BPE decode round-trip and substring-level
  * duplicate-span removal.
  */
class Round11Spec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("jaccard_band_sweep: engaged sample path is the exact md5-rank rule; production cap dormant") {
    // production cap must be dormant at fixture scale
    val full = SparkEntry.queries("jaccard_band_sweep")(spark, sf)
      .as[(Int, Long, Long, Boolean)].collect()
    assert(full.nonEmpty && full.forall(!_._4),
      "production PairSampleCap engaged at sf0.001 — it must be dormant at fixture scale")
    val nFull = full.map(_._2).sum
    // tiny cap: the engaged path must keep exactly the pairs the
    // md5-rank rule admits, recomputed driver-side from the candidate
    // table
    val cap = 5L
    val engaged = QaQueries.jaccardBandSweep(spark, sf, cap)
      .as[(Int, Long, Long, Boolean)].collect()
    assert(engaged.forall(_._4), "tiny cap did not set sampled=true")
    val pairs = LlmQueries.pairTable(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def rank(a: Long, b: Long): Long = {
      val hex = md.digest(s"$a|$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val n = pairs.length.toLong
    val expect = pairs.count { case (a, b) => rank(a, b) * n < cap * 4294967296L }
    val got = engaged.map(_._2).sum
    assert(got == expect && got < nFull,
      s"engaged sample kept $got pairs, md5-rank rule admits $expect (full: $nFull)")
  }

  test("bpe_decode: decode(encode(x)) == normalized x when no OOV symbols") {
    val rows = SparkEntry.queries("bpe_decode")(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val norm = graft.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.normText($"text"))
      .as[(Long, String)].collect().toMap
    val clean = rows.filter(_._4 == 0L)
    assert(clean.nonEmpty, "no doc decodes OOV-free — vocab construction is broken")
    clean.foreach { case (id, nTok, nSym, _, decoded) =>
      assert(decoded == norm(id),
        s"doc $id round-trip mismatch: '$decoded' vs '${norm(id)}'")
      assert(nSym >= nTok, s"doc $id: fewer symbols than tokens")
    }
    // OOV decoding is lossy by construction: '<unk>' per missing symbol
    rows.filter(_._4 > 0L).foreach { case (id, _, _, _, decoded) =>
      assert(decoded.contains("<unk>"), s"doc $id counts OOV but shows no <unk>")
    }
  }

  test("substring_dedup_cut: keep-first span removal on a constructed shared-span corpus") {
    val dir = tmpDir("subcut")
    val shared = "the quick brown fox jumps over the lazy dog"
    Seq(
      (1L, s"alpha beta $shared gamma", "en", "a", 1L),
      (2L, s"$shared entirely different tail words here", "en", "a", 1L),
      (3L, "no overlap with anything else at all zzz", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = try {
      SparkEntry.queries("substring_dedup_cut")(spark, dir)
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    } finally LlmQueries.release(spark, dir, "winnow_fps")
    // doc 1 is the FIRST holder of every shared fingerprint: untouched
    assert(out(1L) == ((1L, 0L, 0L, s"alpha beta $shared gamma")))
    // doc 3 shares nothing: untouched
    assert(out(3L) == ((3L, 0L, 0L, "no overlap with anything else at all zzz")))
    // doc 2 repeats doc 1's 43-char run at its head: winnowing covers
    // every 11-char sub-run of a duplicate, so the ENTIRE duplicated
    // run (incl. the boundary space) is cut. A window straddling the
    // run boundary can still fingerprint-match (its min gram may lie
    // inside the run), so the cut may overreach the run by at most
    // w - 1 = 3 chars per side — bounded, hash-dependent.
    val (_, nSpans, cutChars, kept) = out(2L)
    val t2 = s"$shared entirely different tail words here"
    val tail = "entirely different tail words here"
    assert(nSpans == 1L, s"expected one merged span, got $nSpans")
    assert(t2.endsWith(kept) && tail.endsWith(kept), s"kept not a clean suffix: '$kept'")
    assert(kept.length >= tail.length - 3,
      s"cut overreaches the run by > 3 chars: kept '$kept'")
    assert(cutChars == t2.length - kept.length, s"cut_chars $cutChars")
  }

  test("bpe_decode: ids layer is honest — every non-OOV symbol round-trips through its id") {
    // tiny corpus where the trained vocabulary is fully known: decode
    // output must equal input exactly (all chars in-vocab)
    val dir = tmpDir("bpe_rt")
    Seq(
      (1L, "aba aba aba cab", "en", "a", 1L),
      (2L, "cab aba cab bac", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("bpe_decode")(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    try {
      assert(out(1L)._4 == 0L && out(1L)._5 == "aba aba aba cab")
      assert(out(2L)._4 == 0L && out(2L)._5 == "cab aba cab bac")
    } finally LlmQueries.release(spark, dir, "bpe_words")
  }
}
