package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Dataset-assembly operators — the steps that turn a curated corpus
  * into a training dataset (SURVEY.md §2.11 extensions, twelfth wave):
  * deterministic split assignment, per-domain caps, junk detection,
  * within-document segment dedup, retention sweeps, source-reliability
  * ranking, and the audio leg of the multimodal family.
  *
  * Scale/perf design:
  *  - Everything document-side is a single scan + small aggregate or a
  *    rank-limited window; no all-pairs work, no driver-side state.
  *  - `domain_cap`'s `row_number <= K` filter is planned by Catalyst as
  *    WindowGroupLimit: each map task keeps only its local top-K per
  *    source BEFORE the shuffle, so a source with 99% of a 100 TB
  *    corpus ships K rows per input partition, not its whole corpus
  *    slice, to the window task (pinned in CurationSpec).
  *  - `split_assign` is the md5-bucket idiom (dsir_select's): split
  *    membership is a pure function of doc_id, so the assignment is
  *    reproducible under any partitioning, retry, or engine.
  *  - `audio_rms` mirrors image_decode_stats: REAL javax.sound WAV
  *    encode→decode on executors in the mapPartitions batch shape,
  *    with integer-exact window energies the oracle recomputes
  *    arithmetically — a broken codec path hash-mismatches in the
  *    driver's correctness file instead of hiding behind a spec.
  */
object CurationQueries {

  /** Per-source cap for domain_cap, mirrored into its oracle. */
  private val DomainCapK = 25

  /** Retention-sweep thresholds (min tokens), mirrored into the
    * length_filter_sweep oracle.
    */
  private val SweepThresholds = Seq(8, 16, 32, 64, 128, 256)

  /** RAKE stopword delimiters (the repo's standing 7-word stoplist)
    * and output size, mirrored into the oracle.
    */
  private val RakeStops = Seq("the", "a", "of", "and", "to", "in", "is")
  private val RakeTopK = 30
  private def rakeStopsSql: String =
    RakeStops.map(s => s"'$s'").mkString(", ")

  val defs: Map[String, QueryFn] = Map(
    // RAKE keyword extraction (wave 50, Rose et al. 2010): candidate
    // phrases = maximal stopword-free token runs (rebuilt by ONE
    // per-document array fold — no token-level window, no doc-keyed
    // shuffle: the phrase segmentation costs what the scan costs),
    // word score = deg(w)/freq(w) with deg summing the lengths of
    // every phrase occurrence containing w, phrase score = Σ word
    // scores over the phrase's DISTINCT spelling (computed once per
    // distinct phrase; per-word scores snap to 8dp and sum as
    // decimals, so the phrase score is partition-order-free). Output
    // is the corpus top-30 by (score desc, phrase).
    "rake_keywords" -> ((s, d) => {
      import s.implicits._
      val stops = rakeStopsSql
      // Boundary-index construction, NOT an accumulating fold: a fold
      // that appends to a phrase array / concatenates the current
      // phrase string copies its accumulator per token — quadratic
      // per document, measured 433 s at the 10× long-doc sweep. Here
      // the stopword positions become a boundary array once, zip_with
      // pairs consecutive boundaries (inputs evaluated once — no
      // computed array is referenced inside a lambda), and each
      // phrase slices its own tokens exactly once — linear per doc.
      val bnd =
        s"""concat(array(0),
           |  CASE WHEN size(toks) < 1 THEN CAST(array() AS ARRAY<INT>)
           |    ELSE filter(sequence(1, size(toks)),
           |      i -> element_at(toks, i) IN ($stops)) END,
           |  array(size(toks) + 1))""".stripMargin.replace("\n", " ")
      val phrasesExpr =
        """filter(transform(
          |  zip_with(slice(bnd, 1, size(bnd) - 1),
          |    slice(bnd, 2, size(bnd) - 1),
          |    (a, b) -> named_struct('st', a, 'en', b)),
          |  pr -> CASE WHEN pr.en - pr.st > 1
          |    THEN array_join(slice(toks, pr.st + 1, pr.en - pr.st - 1),
          |      ' ') END),
          |  x -> x IS NOT NULL)""".stripMargin.replace("\n", " ")
      val phrases = Tables.documents(s, d)
        .where($"text".isNotNull)
        .select(TF.tokens($"text").as("tk"))
        .selectExpr("filter(tk, t -> t <> '') AS toks")
        .selectExpr("toks", s"$bnd AS bnd")
        .selectExpr(s"explode($phrasesExpr) AS phrase")
      val occ = phrases.groupBy($"phrase").agg(count(lit(1)).as("n_occ"))
      val words = phrases
        .select($"phrase", size(split($"phrase", " ")).as("plen"))
        .select(explode(split($"phrase", " ")).as("w"), $"plen")
        .groupBy($"w")
        .agg(count(lit(1)).as("freq"), sum($"plen").as("deg"))
        .select($"w",
          rnd($"deg".cast("double") / $"freq".cast("double"), 8).as("wsc"))
      occ.select($"phrase", $"n_occ",
        explode(split($"phrase", " ")).as("w"))
        .join(words, Seq("w"))
        .groupBy($"phrase", $"n_occ")
        .agg(sum($"wsc".cast("decimal(28,8)")).cast("double").as("score"))
        .orderBy($"score".desc, $"phrase")
        .limit(RakeTopK)
    }),


    // Deterministic train/val/test assignment (90/5/5) — the split
    // step every training pipeline runs last. Membership is
    // md5("split:"+doc_id) → bucket 0..99, a pure function of the row
    // key: stable under re-partitioning, retries, incremental
    // re-ingestion, and engine choice (the property that matters —
    // a split that depends on row order leaks eval data on every
    // backfill). One scan, one 3×|langs| aggregate.
    "split_assign" -> ((s, d) => {
      import s.implicits._
      val bucket = conv(
        substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 8),
        16, 10).cast("long") % 100
      Tables.documents(s, d)
        .select($"doc_id", $"lang", TF.nTokens($"text").cast("long").as("n_tok"),
          when(bucket < 90, "train").when(bucket < 95, "val")
            .otherwise("test").as("split"))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("total_tok"))
        .orderBy($"split".asc_nulls_last, $"lang".asc_nulls_last)
    }),

    // Per-domain cap — CCNet/RefinedWeb-style: keep at most K docs per
    // source, best-first (longest, doc_id tiebreak), so no single
    // domain dominates the training mix. The rank-limit filter is
    // planned as WindowGroupLimit (map-side per-partition top-K before
    // the shuffle — pinned in CurationSpec), so a 99%-one-source
    // corpus ships K rows per input split, not the whole source, to
    // the final window task.
    "domain_cap" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"n_tok".desc, $"doc_id".asc_nulls_last)
      Tables.documents(s, d)
        .select($"source", $"doc_id", TF.nTokens($"text").cast("long").as("n_tok"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= DomainCapK)
        .orderBy($"source".asc_nulls_last, $"rk".asc_nulls_last)
    }),

    // Junk/boilerplate detection via the character distribution of the
    // normalized text: a repeated-character or single-token junk doc
    // concentrates its mass on few symbols. Transcendental-free
    // concentration stats (the entropy-filter use case without
    // cross-engine log risk): top_char_frac = max(c)/n (one exact IEEE
    // division) and the Gini/Simpson concentration Σ(c/n)² with each
    // term snapped to 12dp and decimal-summed (embedding_quantize's
    // exact-sum idiom). Alphabet after normText is ≤37 symbols, so the
    // per-doc aggregate is bounded; shape is the shingle family's
    // (position explode, shuffle by doc_id only).
    "junk_detect" -> ((s, d) => {
      import s.implicits._
      // explode the CHAR ARRAY, never positions-plus-the-string: the
      // position form carried the whole document text in every
      // exploded row (n_chars copies of an up-to-50k-char string —
      // measured 197 s at 10× with the long-doc stratum; this form
      // reads 11 s-scale because Generate prunes the parent text)
      val chars = Tables.documents(s, d)
        .select($"doc_id", TF.normText($"text").as("t"))
        .filter(length($"t") > 0)
        .select($"doc_id", explode(split($"t", "")).as("ch"))
        .filter($"ch" =!= "")
      val counts = chars.groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
        // per-doc char total via a doc-partitioned window over the
        // (≤37-symbol) count rows — bounded per doc, no second scan
        .withColumn("nd", sum($"c").over(Window.partitionBy($"doc_id"))
          .cast("double"))
      counts.groupBy($"doc_id")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_distinct_chars"),
          max($"c").as("cmax"),
          sum(rnd(($"c".cast("double") / $"nd") * ($"c".cast("double") / $"nd"),
            12).cast("decimal(28,12)")).cast("double").as("gini"))
        .select($"doc_id", $"n".as("n_chars_norm"), $"n_distinct_chars",
          ($"cmax".cast("double") / $"n".cast("double")).as("top_char_frac"),
          rnd($"gini", 10).as("char_gini"),
          ($"cmax".cast("double") / $"n".cast("double") > 0.3).as("is_junk"))
        .orderBy($"doc_id")
    }),

    // Within-document segment dedup (C4's repeated-line filter,
    // sentence-level): split the RAW text on '. ', normalize segments,
    // and measure how much of the document is repeated segments — the
    // boilerplate signal (nav bars, cookie banners) that per-corpus
    // dedup misses. Shuffles by doc_id only.
    "line_dedup" -> ((s, d) => {
      import s.implicits._
      val segs = Tables.documents(s, d)
        .select($"doc_id", explode(split($"text", "\\. ")).as("seg"))
        .select($"doc_id", trim(lower($"seg")).as("seg"))
        .filter(length($"seg") > 0)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_seg"), countDistinct($"seg").as("n_uniq"))
      Tables.documents(s, d).select($"doc_id")
        .join(segs, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_seg", lit(0L)).as("n_seg"),
          coalesce($"n_uniq", lit(0L)).as("n_uniq"),
          when(coalesce($"n_seg", lit(0L)) === 0, lit(0.0))
            .otherwise(lit(1.0) - $"n_uniq".cast("double") / $"n_seg".cast("double"))
            .as("dup_seg_frac"))
        .orderBy($"doc_id")
    }),

    // URL canonicalization + dedup (wave 36): the fetch-list dedup a
    // crawl pipeline runs BEFORE fetching — strip fragments, tracking
    // params, default ports and trailing slashes, lowercase the
    // scheme://host prefix (paths stay case-sensitive), then group.
    // The corpus is URL-free, so each doc gets a deterministic
    // synthetic URL whose variant class (doc_id mod 4) exercises one
    // canonicalization rule each — the pii_scrub synthetic-column
    // precedent: the oracle then pins the whole normalize chain
    // value-for-value. The chain is a single codegen'd
    // regexp_replace/concat projection over one scan + one hash
    // aggregate — embarrassingly parallel at any scale. No $1/\\1
    // regex backreferences anywhere: Java and RE2 spell them
    // differently, so the chain sticks to plain patterns both
    // engines parse identically.
    "url_dedup" -> ((s, d) => {
      import s.implicits._
      val host = concat(lit("WWW.Site"), ($"doc_id" % 7).cast("string"),
        lit(".Example.com"))
      val path = concat(lit("/articles/item"),
        ($"doc_id" % 13).cast("string"))
      val raw = when($"doc_id" % 4 === 0,
          concat(lit("http://"), host, lit(":80"), path,
            lit("?utm_source=feed&utm_campaign=x")))
        .when($"doc_id" % 4 === 1,
          concat(lit("HTTP://"), lower(host), path, lit("/")))
        .when($"doc_id" % 4 === 2,
          concat(lit("https://"), host, lit(":443"), path,
            lit("#section-2")))
        .otherwise(
          concat(lit("https://"), lower(host), path,
            lit("?ref=kept&utm_medium=email")))
      val canon = concat(
        lower(regexp_extract(col("_u3"), "^([^/]+//[^/]+)", 1)),
        regexp_extract(col("_u3"), "^[^/]+//[^/]+(.*)$", 1))
      Tables.documents(s, d)
        .select($"doc_id", raw.as("raw_url"))
        .withColumn("_u0", regexp_replace($"raw_url", "#.*$", ""))
        .withColumn("_u1", regexp_replace(
          regexp_replace($"_u0", "utm_[a-z]+=[^&#]*&", ""),
          "[?&]utm_[a-z]+=[^&#]*", ""))
        .withColumn("_u2", regexp_replace($"_u1", "/$", ""))
        .withColumn("_u3", expr(
          "replace(replace(_u2, ':80/', '/'), ':443/', '/')"))
        .select($"doc_id", canon.as("canonical_url"), $"raw_url")
        .groupBy($"canonical_url")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keeper"),
          countDistinct($"raw_url").as("n_raw_variants"))
        .orderBy($"canonical_url")
    }),

    // Retention sweep — the dataset-card table answering "how much
    // survives a minimum-length filter at T?" for a ladder of
    // thresholds, in ONE scan: each doc fans out to the 6 fixed
    // thresholds (bounded 6× row fan, no second corpus read) and the
    // aggregate computes docs/tokens retained plus exact retention
    // ratios.
    "length_filter_sweep" -> ((s, d) => {
      import s.implicits._
      val t = Tables.documents(s, d)
        .select($"doc_id", TF.nTokens($"text").cast("long").as("n_tok"))
      t.select($"n_tok",
          explode(array(SweepThresholds.map(x => lit(x.toLong)): _*)).as("threshold"))
        .groupBy($"threshold")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"n_tok" >= $"threshold", 1L).otherwise(0L)).as("docs_retained"),
          sum(when($"n_tok" >= $"threshold", $"n_tok").otherwise(0L)).as("tok_retained"),
          sum($"n_tok").as("tok_total"))
        .select($"threshold", $"docs_retained", $"tok_retained",
          ($"docs_retained".cast("double") / $"n_docs".cast("double"))
            .as("doc_frac"),
          when($"tok_total" === 0, lit(0.0))
            .otherwise($"tok_retained".cast("double") / $"tok_total".cast("double"))
            .as("tok_frac"))
        .orderBy($"threshold")
    }),

    // Source-reliability ranking by the Wilson lower bound (z = 1.96)
    // of the per-source quality pass rate — the order a curation
    // pipeline should prioritize sources in, because the lower bound
    // discounts small-sample sources the raw rate overrates. The pass
    // predicate is the gopher-lite pair (length band + punctuation
    // cap); the whole op is one scan + one |sources|-row aggregate +
    // pure scalar math in a pinned IEEE op order (sqrt is
    // correctly-rounded in both engines), snapped to 6dp.
    "source_reliability" -> ((s, d) => {
      import s.implicits._
      val nTok = TF.nTokens($"text")
      val pass = (nTok >= 5) && (nTok <= 10000) && (TF.punctRatio($"text") <= 0.3)
      val z = lit(1.96)
      val agg = Tables.documents(s, d)
        // when/otherwise (not a bare boolean cast): a NULL text makes
        // `pass` NULL, which must count as a FAIL (the oracle's CASE
        // ELSE 0), not poison the sum to NULL
        .select($"source", when(pass, 1L).otherwise(0L).as("p"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"p").as("n_pass"))
      val n = $"n_docs".cast("double")
      val p = $"n_pass".cast("double") / n
      val z2 = z * z
      val wilson = (p + z2 / (lit(2.0) * n)
        - z * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * n)) / n)) /
        (lit(1.0) + z2 / n)
      agg.select($"source", $"n_docs", $"n_pass",
          p.as("pass_rate"), rnd(wilson, 6).as("wilson_lb"))
        .orderBy($"wilson_lb".desc, $"source")
    }),

    // Corpus-prefix novelty: the fraction of a document's distinct
    // 3-gram shingles whose FIRST corpus occurrence (min doc_id) is
    // this document — the "how much genuinely new text does each doc
    // add?" signal an incremental-curation pipeline ranks ingest
    // batches by. Reuses the memoized distinct-shingle relation; first
    // occurrence is a shingle-partitioned window min, so the whole op
    // is one shingle-keyed shuffle (the dedup family's shape) + one
    // doc-keyed aggregate — no join back, no second corpus read.
    "ngram_novelty" -> ((s, d) => {
      import s.implicits._
      val sh = LlmQueries.distinctShingleTable(s, d)
      sh.withColumn("first_doc",
          min($"doc_id").over(Window.partitionBy($"sh")))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
        .select($"doc_id", $"n_shingles", $"n_novel",
          ($"n_novel".cast("double") / $"n_shingles".cast("double"))
            .as("novelty_frac"))
        .orderBy($"doc_id")
    }),

    // Quality-signal calibration: bucket the bigram-LM score into
    // 1/20-wide probability bins and report the gopher pass rate per
    // bin — the "does the cheap score predict the rule verdict?"
    // curve a pipeline reads before trusting one signal to replace
    // the other. Pure composition: the lm_score pipeline (one corpus
    // scan + broadcast LM probe) joined to the rule flags, collapsed
    // to ≤21 rows.
    "quality_calibration" -> ((s, d) => {
      import s.implicits._
      val lm = LlmQueries.defs("lm_score")(s, d).select($"doc_id", $"mean_p")
      val flags = Tables.documents(s, d)
        .select($"doc_id", LlmQueries.gopherPass($"text").cast("long").as("pass"))
      lm.join(flags, Seq("doc_id"))
        .withColumn("bucket", floor($"mean_p" * 20).cast("long"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"pass").as("n_pass"))
        .select($"bucket", $"n_docs", $"n_pass",
          ($"n_pass".cast("double") / $"n_docs".cast("double")).as("pass_rate"))
        .orderBy($"bucket")
    }),

    // REAL audio codec round-trip, driver-oracled — the audio leg of
    // the multimodal family (image_decode_stats' design): each doc
    // synthesizes a deterministic 16-bit mono PCM signal
    // (amp_i = floorMod(doc_id·31 + i·17, 2003) − 1001, n = 800 +
    // (doc_id mod 5)·160 samples), ENCODES it as WAV and DECODES it
    // back through javax.sound.sampled on the executors, then emits
    // integer-exact per-160-sample window energies. Because the
    // signal is a closed-form function of doc_id, the oracle
    // recomputes every output arithmetically — a header-parsing or
    // sample-decoding bug hash-mismatches in the driver's correctness
    // file. Scan-parallel; the only shuffle is the final ORDER BY.
    "audio_rms" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select($"doc_id").as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 800 + java.lang.Math.floorMod(id, 5L).toInt * 160
            val pcm = new Array[Byte](n * 2) // little-endian s16le
            var i = 0
            while (i < n) {
              val amp =
                (java.lang.Math.floorMod(id * 31 + i.toLong * 17, 2003L) - 1001L).toShort
              pcm(2 * i) = (amp & 0xFF).toByte
              pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (id, bos.toByteArray)
          }
        }
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            // the REAL decode under test: WAV header parse + PCM read
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            var total = 0L; var maxW = Long.MinValue; var w = 0L
            var i = 0
            while (i < n) {
              val v = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xFF)).toShort.toLong
              w += v * v
              if (i % 160 == 159) { // n is always a multiple of 160
                total += w; if (w > maxW) maxW = w; w = 0L
              }
              i += 1
            }
            (id, n.toLong, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              (n / 160).toLong, total, maxW)
          }
        }
        .toDF("doc_id", "n_samples", "sample_rate", "channels",
          "n_windows", "total_ssq", "max_window_ssq")
        .orderBy($"doc_id")
    }),

    // Snapshot diff by CONTENT hash: two overlapping dataset versions
    // (v1 = doc_id%10 ≠ 9, v2 = doc_id%10 ≠ 0 — an 80%-overlap
    // rolling refresh) compared at the fingerprint level, so a doc
    // re-ingested under a new id counts as kept, not added+removed —
    // the audit table_diff's row-identity diff can't produce. One
    // scan, one (lang, fp) aggregate, one lang collapse.
    "dataset_version_diff" -> ((s, d) => {
      import s.implicits._
      val f = Tables.documents(s, d)
        .select($"lang", TF.fingerprint($"text").as("fp"),
          (pmod($"doc_id", lit(10L)) =!= 9L).cast("int").as("v1"),
          (pmod($"doc_id", lit(10L)) =!= 0L).cast("int").as("v2"))
        .groupBy($"lang", $"fp")
        .agg(max($"v1").as("v1"), max($"v2").as("v2"))
      f.groupBy($"lang")
        .agg(
          sum(when($"v1" === 1 && $"v2" === 0, 1L).otherwise(0L)).as("n_removed"),
          sum(when($"v1" === 0 && $"v2" === 1, 1L).otherwise(0L)).as("n_added"),
          sum(when($"v1" === 1 && $"v2" === 1, 1L).otherwise(0L)).as("n_kept"))
        .orderBy($"lang".asc_nulls_last)
    }),

    // Curriculum phases: per-language easy→hard thirds by quality
    // score (ascending — curricula start easy), with per-phase mass.
    // Uses DistributedNtile (ccnet_buckets' skew-free exact NTILE):
    // a dominant language never routes its corpus slice through one
    // window task. Second consumer of the primitive — the skew
    // lesson as shared infrastructure, not a per-query fix.
    "curriculum_schedule" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d)
        .select($"lang", $"doc_id",
          TF.nTokens($"text").cast("long").as("n_tok"),
          TF.qualityScore($"text").as("q"))
      // asc_nulls_last: Spark asc is NULLS FIRST, DuckDB's is NULLS
      // LAST — a null quality score (null text) would shift the whole
      // phase assignment off the oracle (ADVICE r9)
      graft.operators.DistributedNtile
        .withNtile(base, "lang",
          Seq($"q".asc_nulls_last, $"doc_id".asc_nulls_last), 3, "phase")
        .groupBy($"lang", $"phase")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tok"),
          min($"q").as("q_min"), max($"q").as("q_max"))
        // asc_nulls_last on the OUTPUT sort too: a null lang stratum
        // (null-injected corpus) must land where DuckDB's ORDER BY
        // puts it
        .orderBy($"lang".asc_nulls_last, $"phase")
    }),

    // Simpson diversity per source (wave 42): collision probability
    // of the token distribution, D = Σc(c−1)/(n(n−1)) — the UNBIASED
    // estimator, integer-exact until one final division (no
    // transcendentals: this is the Rényi-2 counterpart of Shannon
    // entropy, which the cross-engine libm rule bars). The inverse
    // (Hill number of order 2) is the "effective vocabulary" the
    // corpus-card reports. One scan → (source, term) aggregate →
    // source rollup; per-term products stay in int64 (safe while any
    // single term stays under ~3·10⁹ occurrences per source) and the
    // sums ride decimal(38,0), so overflow is bounded and exact.
    "simpson_diversity" -> ((s, d) => {
      import s.implicits._
      val c = Tables.documents(s, d)
        .where($"text".isNotNull)
        .select($"source", explode(TF.tokens($"text")).as("term"))
        .where($"term" =!= "")
        .groupBy($"source", $"term").agg(count(lit(1)).as("c"))
      c.groupBy($"source")
        .agg(sum($"c").as("n_tok"), count(lit(1)).as("n_types"),
          sum(($"c" * ($"c" - 1L)).cast("decimal(38,0)")).as("sc2"))
        .select($"source", $"n_tok", $"n_types",
          when($"n_tok" > 1L,
            rnd($"sc2".cast("double") /
              ($"n_tok".cast("double") * ($"n_tok" - 1L).cast("double")), 9))
            .as("simpson"),
          when($"sc2" > 0,
            rnd(($"n_tok".cast("double") * ($"n_tok" - 1L).cast("double")) /
              $"sc2".cast("double"), 4)).as("effective_types"))
        .orderBy($"source".asc_nulls_last)
    }),

    // Burrows' Delta between sources (wave 42): the classic
    // authorship-attribution distance — z-score each source's
    // relative frequency of the corpus-wide top-30 terms against the
    // across-source mean/std, then Delta(a,b) = mean |z_a − z_b|.
    // The corpus-scale work is ONE (source, term) count aggregate;
    // everything after runs on the bounded |sources|×30 grid (zero
    // counts included — a source that never uses a top term is
    // evidence, not a missing row). Frequencies snap to
    // decimal(18,12) and every cross-row sum rides decimals, so
    // means/stds are partition-order-independent; σ=0 terms
    // contribute z=0 by convention in both engines.
    "burrows_delta" -> ((s, d) => {
      import s.implicits._
      val tok = Tables.documents(s, d)
        .where($"text".isNotNull && $"source".isNotNull)
        .select($"source", explode(TF.tokens($"text")).as("term"))
        .where($"term" =!= "")
      val counts = tok.groupBy($"source", $"term").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy($"source").agg(sum($"c").as("n"))
      val top = counts.groupBy($"term").agg(sum($"c").as("tc"))
        .orderBy($"tc".desc, $"term").limit(BurrowsK)
      val grid = totals.crossJoin(broadcast(top.select($"term")))
        .join(counts, Seq("source", "term"), "left")
        .select($"source", $"term",
          rnd(coalesce($"c", lit(0L)).cast("double") / $"n".cast("double"),
            12).cast("decimal(18,12)").as("f"))
      val mu = $"s1".cast("double") / $"k".cast("double")
      val stats = grid.groupBy($"term")
        .agg(count(lit(1)).as("k"), sum($"f").as("s1"),
          sum(rnd($"f".cast("double") * $"f".cast("double"), 18)
            .cast("decimal(38,18)")).as("s2"))
        .select($"term", mu.as("mu"),
          sqrt(greatest($"s2".cast("double") / $"k".cast("double") - mu * mu,
            lit(0.0))).as("sigma"))
      val z = grid.join(broadcast(stats), Seq("term"))
        .select($"source", $"term",
          when($"sigma" > 0.0, ($"f".cast("double") - $"mu") / $"sigma")
            .otherwise(lit(0.0)).as("z"))
      val za = z.select($"term", $"source".as("source_a"), $"z".as("z_a"))
      val zb = z.select($"term", $"source".as("source_b"), $"z".as("z_b"))
      za.join(zb, Seq("term")).where($"source_a" < $"source_b")
        .groupBy($"source_a", $"source_b")
        .agg(count(lit(1)).as("n_terms"),
          sum(rnd(abs($"z_a" - $"z_b"), 9).cast("decimal(18,9)")).as("sd"))
        .select($"source_a", $"source_b", $"n_terms",
          rnd($"sd".cast("double") / $"n_terms".cast("double"), 6)
            .as("delta"))
        .orderBy($"source_a", $"source_b")
    }),

    // TextTiling-lite topic segmentation (wave 45, Hearst 1997's
    // shape): slice each document into 20-token blocks, score
    // adjacent blocks by distinct-token Jaccard, and cut a segment
    // boundary where similarity drops below 0.1 — the topic-aware
    // chunker next to doc_chunk's fixed windows (chunking at topic
    // shifts instead of mid-topic is what keeps training sequences
    // coherent). Pure per-document array arithmetic after one scan:
    // integer set sizes → one exact rational per gap; the mean
    // similarity is a fixed-order fold. Zero shuffles.
    "texttiling_segments" -> ((s, d) => {
      import s.implicits._
      // blocks are DISTINCTed once into an array-of-arrays, then each
      // gap reads two prebuilt sets + one intersect: the naive
      // per-gap re-derivation (4× array_distinct + 2× intersect per
      // gap) measured 539 s at 100× — this shape does a third of the
      // array work
      // element_at on arrays takes INT; the lambda index is BIGINT
      val b1 = "element_at(blk, CAST(i + 1 AS INT))"
      val b2 = "element_at(blk, CAST(i + 2 AS INT))"
      val jacc =
        s"""CAST(size(array_intersect($b1, $b2)) AS DOUBLE) /
           |CAST(size($b1) + size($b2)
           |  - size(array_intersect($b1, $b2))
           |  AS DOUBLE)""".stripMargin.replace("\n", " ")
      Tables.documents(s, d)
        .where($"text".isNotNull && length(TF.normText($"text")) > 0)
        .select($"doc_id", TF.tokens($"text").as("toks"))
        .selectExpr("doc_id", "size(toks) AS n_tok",
          s"(size(toks) + ${TtBlock - 1}) DIV $TtBlock AS n_blocks",
          s"""transform(sequence(0, (size(toks) + ${TtBlock - 1})
             | DIV $TtBlock - 1),
             | i -> array_distinct(slice(toks, i * $TtBlock + 1, $TtBlock)))
             | AS blk""".stripMargin.replace("\n", " "))
        .selectExpr("doc_id", "n_tok", "n_blocks",
          s"""CASE WHEN n_blocks >= 2
             |  THEN transform(sequence(0, n_blocks - 2), i -> $jacc)
             |  ELSE array() END AS sims""".stripMargin.replace("\n", " "))
        .selectExpr("doc_id", "n_tok", "n_blocks",
          s"size(filter(sims, x -> x < $TtCut)) AS n_boundaries",
          s"""CASE WHEN n_blocks >= 2 THEN
             |  aggregate(sims, CAST(0 AS DOUBLE), (acc, x) -> acc + x)
             |    / CAST(n_blocks - 1 AS DOUBLE) END AS mean_sim""".stripMargin
            .replace("\n", " "))
        .select($"doc_id", $"n_tok", $"n_blocks", $"n_boundaries",
          ($"n_boundaries" + 1).as("n_segments"),
          rnd($"mean_sim", 6).as("mean_sim"))
        .orderBy($"doc_id")
    }),

    // Code-vs-prose screen per source (wave 59): pretraining
    // pipelines route code and prose to different tokenizer/mix
    // budgets, so the curation layer needs the cheap structural
    // classifier — code symbol density ({};()=<>[] per char) and
    // indented-line fraction, the two signals a lexer-free heuristic
    // actually has. RAW text (not the normalized form — the norm
    // strips exactly the characters that carry the signal), one scan,
    // per-doc 8dp-snapped densities decimal-summed into a bounded
    // per-source report. The symbol count is length minus the
    // symbol-stripped length (one regex pass; the oracle needs
    // DuckDB's 'g' flag — a known cross-engine trap, mirrored);
    // indent detection is codegen'd startswith, not regex.
    "code_detect" -> ((s, d) => {
      import s.implicits._
      // line counting via replace-arithmetic, NOT split: Spark's
      // split drops trailing empty fields while DuckDB's string_split
      // keeps them — a doc ending in '\n' would diverge. Lines =
      // newlines + 1; indented lines = occurrences of "\n<sp>" +
      // "\n<tab>" + an indented first line — identical character
      // arithmetic in both engines.
      val perDoc = Tables.documents(s, d)
        .where($"text".isNotNull)
        .selectExpr("coalesce(source, '__null__') AS src",
          "length(text) AS len",
          // Spark's SQL parser consumes backslash escapes inside
          // string literals (DuckDB's does not) — double them so the
          // regex engine sees the same \[ \] class in both engines
          s"length(text) - length(regexp_replace(text," +
            s" '${CodeSymClass.replace("\\", "\\\\")}', '')) AS sym",
          "1 + length(text) - length(replace(text, char(10), ''))" +
            " AS n_lines",
          "(length(text) - length(replace(text, char(10) || ' ', '')))" +
            " DIV 2" +
            " + (length(text) - length(replace(text," +
            " char(10) || char(9), ''))) DIV 2" +
            " + (CASE WHEN startswith(text, ' ')" +
            " OR startswith(text, char(9)) THEN 1 ELSE 0 END)" +
            " AS n_indent")
        .where($"len" > 0)
        .select($"src",
          rnd($"sym".cast("double") / $"len".cast("double"), 8)
            .as("density"),
          rnd($"n_indent".cast("double") / $"n_lines".cast("double"), 8)
            .as("indent_frac"))
        .select($"src", $"density", $"indent_frac",
          ($"density" > CodeDensityCut || $"indent_frac" > CodeIndentCut)
            .as("is_code"))
      perDoc.groupBy($"src").agg(
          count(lit(1)).as("n_docs"),
          sum(when($"is_code", 1L).otherwise(0L)).as("n_code"),
          sum($"density".cast("decimal(18,8)")).as("sd"),
          sum($"indent_frac".cast("decimal(18,8)")).as("si"))
        .select($"src", $"n_docs", $"n_code",
          rnd($"n_code".cast("double") / $"n_docs".cast("double"), 6)
            .as("code_frac"),
          rnd($"sd".cast("double") / $"n_docs".cast("double"), 6)
            .as("avg_sym_density"),
          rnd($"si".cast("double") / $"n_docs".cast("double"), 6)
            .as("avg_indent_frac"))
        .orderBy($"src")
    }),

    // see [[tokenizerCompressionDef]]
    "tokenizer_compression" -> ((s, d) => tokenizerCompressionDef(s, d)),

    // Per-source duplicate-rate breakdown (wave 62): exact_dedup
    // answers "how many copies exist"; the curation decision needs
    // "WHICH source is producing them" — the per-slice duplicate
    // rate against the corpus-wide exact-fingerprint groups (a copy
    // in source B of a doc first seen in source A counts against B:
    // keeper = min doc_id corpus-wide, the exact_dedup convention).
    // One fingerprint aggregate (corpus-keyed), one fp-keyed join
    // back, one bounded per-source rollup.
    "source_dup_rate" -> ((s, d) => {
      import s.implicits._
      val fps = Tables.documents(s, d)
        .select($"doc_id", coalesce($"source", lit("__null__")).as("src"),
          TF.fingerprint($"text").as("fp"))
      val keepers = fps.groupBy($"fp").agg(min($"doc_id").as("keeper"))
      fps.join(keepers, Seq("fp"))
        .groupBy($"src").agg(
          count(lit(1)).as("n_docs"),
          sum(when($"doc_id" =!= $"keeper", 1L).otherwise(0L))
            .as("n_dups"),
          countDistinct($"fp").as("n_distinct_fp"))
        .select($"src", $"n_docs", $"n_dups", $"n_distinct_fp",
          rnd($"n_dups".cast("double") / $"n_docs".cast("double"), 6)
            .as("dup_rate"))
        .orderBy($"src")
    }),

    // Pairwise source vocabulary overlap (wave 63): the |sources|²
    // Jaccard matrix over distinct-term sets — "are these two crawl
    // slices the same content under different labels", the
    // cross-source sibling of js_divergence's each-vs-corpus view.
    // One distinct (source, term) aggregate off the memoized term
    // relation, then a term-keyed self-join whose per-term fan-out
    // is ≤ C(|sources|, 2) — a constant multiplier, so the pair
    // enumeration stays linear in the vocabulary at any corpus size.
    // All-integer counts; one snapped closing division per pair.
    "source_overlap" -> ((s, d) => {
      import s.implicits._
      val st = LlmQueries.termTable(s, d)
        .join(Tables.documents(s, d).select($"doc_id",
          coalesce($"source", lit("__null__")).as("src")), Seq("doc_id"))
        .select($"src", $"term").distinct()
      val sizes = st.groupBy($"src").agg(count(lit(1)).as("nt"))
      val inter = st.select($"src".as("sa"), $"term")
        .join(st.select($"src".as("sb"), $"term"), Seq("term"))
        .filter($"sa" < $"sb")
        .groupBy($"sa", $"sb").agg(count(lit(1)).as("n_common"))
      inter
        .join(broadcast(sizes.select($"src".as("sa"), $"nt".as("na"))),
          Seq("sa"))
        .join(broadcast(sizes.select($"src".as("sb"), $"nt".as("nb"))),
          Seq("sb"))
        .select($"sa", $"sb", $"na", $"nb", $"n_common",
          rnd($"n_common".cast("double") /
            ($"na" + $"nb" - $"n_common").cast("double"), 6).as("jaccard"))
        .orderBy($"sa", $"sb")
    })
  )

  /** code_detect's symbol class and decision cuts, mirrored in the
    * oracle. The class is deliberately lexer-free: structural
    * characters that prose essentially never carries at density.
    */
  private val CodeSymClass = """[{}();=<>\[\]]"""
  private val CodeDensityCut = 0.05
  private val CodeIndentCut = 0.3

  /** Tokenizer compression audit per source (wave 61): characters
    * per BPE-ish token and per whitespace word — the number that
    * decides a tokenizer's budget split across sources (code and
    * non-Latin slices run fertile; the chars/token ratio is the
    * budget multiplier). One scan; exact integer char/token sums;
    * the closing ratios are single divisions snapped at 4dp. NULL
    * text drops; NULL sources form the '__null__' class.
    */
  private def tokenizerCompressionDef: Q.QueryFn = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .where($"text".isNotNull)
      .select(coalesce($"source", lit("__null__")).as("src"),
        length($"text").cast("long").as("chars"),
        TF.nTokens($"text").cast("long").as("wtok"),
        TF.bpeTokenCount($"text").cast("long").as("btok"))
      .groupBy($"src").agg(
        count(lit(1)).as("n_docs"),
        sum($"chars").as("chars"),
        sum($"wtok").as("ws_tokens"),
        sum($"btok").as("bpe_tokens"))
      .select($"src", $"n_docs", $"chars", $"ws_tokens", $"bpe_tokens",
        when($"bpe_tokens" > 0L,
          rnd($"chars".cast("double") / $"bpe_tokens".cast("double"), 4))
          .as("chars_per_bpe"),
        when($"ws_tokens" > 0L,
          rnd($"chars".cast("double") / $"ws_tokens".cast("double"), 4))
          .as("chars_per_word"))
      .orderBy($"src")
  }

  /** TextTiling block width (tokens) and boundary cut, mirrored in
    * the oracle.
    */
  private val TtBlock = 20
  private val TtCut = 0.1

  /** Burrows' Delta top-term pool size, mirrored into the oracle. */
  private val BurrowsK = 30

  val oracles: Map[String, String] = Map(

    // same phrases via the islands construction (equal to the
    // engine's per-doc fold: runs between stopwords — a fold in
    // DuckDB's list_reduce copies the accumulator per element, which
    // is quadratic on long documents), same 8dp word scores, same
    // decimal phrase sums
    "rake_keywords" -> {
      val stops = rakeStopsSql
      s"""WITH tk AS (SELECT doc_id,
         |   list_filter(${LlmQueries.TOKS}, t -> t <> '') AS toks
         |  FROM documents),
         |tok AS (SELECT doc_id, toks,
         |   unnest(range(1, len(toks) + 1)) AS i FROM tk
         |  WHERE toks IS NOT NULL AND len(toks) > 0),
         |tt AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
         |   toks[CAST(i AS INTEGER)] AS term,
         |   toks[CAST(i AS INTEGER)] IN ($stops) AS stop FROM tok),
         |isl AS (SELECT doc_id, i, term, stop,
         |   CAST(coalesce(sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY doc_id ORDER BY i
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         |     AS BIGINT) AS pid
         |  FROM tt),
         |ph AS (SELECT string_agg(term, ' ' ORDER BY i) AS phrase
         |  FROM isl WHERE NOT stop GROUP BY doc_id, pid),
         |occ AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ
         |  FROM ph GROUP BY phrase),
         |wr AS (SELECT unnest(string_split(phrase, ' ')) AS w,
         |   len(string_split(phrase, ' ')) AS plen FROM ph),
         |ws AS (SELECT w, ${Q.duckRnd(
          "CAST(sum(plen) AS DOUBLE) / count(*)", 8)} AS wsc
         |  FROM wr GROUP BY w),
         |pw AS (SELECT occ.phrase, occ.n_occ,
         |   unnest(string_split(occ.phrase, ' ')) AS w FROM occ)
         |SELECT pw.phrase, pw.n_occ,
         | CAST(sum(CAST(ws.wsc AS DECIMAL(28,8))) AS DOUBLE) AS score
         |FROM pw JOIN ws ON pw.w = ws.w
         |GROUP BY pw.phrase, pw.n_occ
         |ORDER BY score DESC, phrase LIMIT $RakeTopK""".stripMargin
    },

    // same md5 bucket function of doc_id, same 90/5/5 edges
    "split_assign" ->
      s"""WITH b AS (SELECT doc_id, lang, CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok,
         |  ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |    % 100 AS bkt
         |  FROM documents)
         |SELECT CASE WHEN bkt < 90 THEN 'train' WHEN bkt < 95 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok
         |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    // same rank order (n_tok desc, doc_id), same K
    "domain_cap" ->
      s"""WITH t AS (SELECT source, doc_id,
         |    CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok FROM documents),
         |r AS (SELECT source, doc_id, n_tok, CAST(row_number() OVER (
         |    PARTITION BY source ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rk
         |  FROM t)
         |SELECT source, doc_id, n_tok, rk FROM r WHERE rk <= $DomainCapK
         |ORDER BY source, rk""".stripMargin,

    // same normalized alphabet, same 12dp-snap + decimal-sum Σ(c/n)²
    "junk_detect" ->
      s"""WITH n AS (SELECT doc_id, ${LlmQueries.NORM} AS t FROM documents
         |           WHERE length(${LlmQueries.NORM}) > 0),
         |ch AS (SELECT doc_id, substr(t, CAST(p AS INTEGER), 1) AS ch
         |  FROM (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS p
         |        FROM n) i),
         |c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
         |t AS (SELECT doc_id, sum(c) AS n, count(*) AS n_distinct_chars,
         |        max(c) AS cmax FROM c GROUP BY doc_id),
         |g AS (SELECT c.doc_id, sum(CAST(${Q.duckRnd(
               "(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))" +
                 " * (CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))", 12)}
         |      AS DECIMAL(28,12))) AS gini
         |  FROM c JOIN t ON c.doc_id = t.doc_id GROUP BY c.doc_id)
         |SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_chars_norm,
         |  t.n_distinct_chars,
         |  CAST(t.cmax AS DOUBLE) / CAST(t.n AS DOUBLE) AS top_char_frac,
         |  ${Q.duckRnd("CAST(g.gini AS DOUBLE)", 10)} AS char_gini,
         |  (CAST(t.cmax AS DOUBLE) / CAST(t.n AS DOUBLE) > 0.3) AS is_junk
         |FROM t JOIN g ON t.doc_id = g.doc_id ORDER BY t.doc_id""".stripMargin,

    // same '. ' literal split, same lower+trim normalization
    "line_dedup" ->
      s"""WITH segs AS (
         |  SELECT doc_id, trim(lower(seg)) AS seg
         |  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS seg
         |        FROM documents) x
         |  WHERE length(trim(lower(seg))) > 0),
         |a AS (SELECT doc_id, count(*) AS n_seg,
         |        count(DISTINCT seg) AS n_uniq FROM segs GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_seg, 0) AS n_seg,
         |  coalesce(a.n_uniq, 0) AS n_uniq,
         |  CASE WHEN coalesce(a.n_seg, 0) = 0 THEN 0.0
         |       ELSE 1.0 - CAST(a.n_uniq AS DOUBLE) / CAST(a.n_seg AS DOUBLE)
         |  END AS dup_seg_frac
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // same synthetic variant classes, same normalize chain ('g' on
    // every regexp_replace — DuckDB replaces first-match by default
    // where Spark replaces all), same grouping
    "url_dedup" ->
      """WITH hosts AS (SELECT doc_id,
        |  'WWW.Site' || (doc_id % 7)::VARCHAR || '.Example.com' AS host,
        |  '/articles/item' || (doc_id % 13)::VARCHAR AS path
        | FROM documents),
        |raw AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN
        |    'http://' || host || ':80' || path
        |      || '?utm_source=feed&utm_campaign=x'
        |  WHEN doc_id % 4 = 1 THEN
        |    'HTTP://' || lower(host) || path || '/'
        |  WHEN doc_id % 4 = 2 THEN
        |    'https://' || host || ':443' || path || '#section-2'
        |  ELSE
        |    'https://' || lower(host) || path || '?ref=kept&utm_medium=email'
        |  END AS raw_url
        | FROM hosts),
        |c AS (SELECT doc_id, raw_url,
        |  replace(replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(raw_url, '#.*$', '', 'g'),
        |          'utm_[a-z]+=[^&#]*&', '', 'g'),
        |        '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
        |      '/$', '', 'g'),
        |    ':80/', '/'), ':443/', '/') AS u3
        | FROM raw),
        |k AS (SELECT doc_id, raw_url,
        |  lower(regexp_extract(u3, '^([^/]+//[^/]+)', 1))
        |    || regexp_extract(u3, '^[^/]+//[^/]+(.*)$', 1) AS canonical_url
        | FROM c)
        |SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keeper,
        | CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_variants
        |FROM k GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    // same threshold ladder, same exact retention ratios
    "length_filter_sweep" -> {
      val vals = SweepThresholds.map(t => s"($t)").mkString(", ")
      s"""WITH t AS (SELECT doc_id, CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok
         |           FROM documents),
         |f AS (SELECT CAST(threshold AS BIGINT) AS threshold, n_tok
         |      FROM t CROSS JOIN (VALUES $vals) th(threshold)),
         |a AS (SELECT threshold, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_tok >= threshold THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_retained,
         |  CAST(sum(CASE WHEN n_tok >= threshold THEN n_tok ELSE 0 END) AS BIGINT)
         |    AS tok_retained,
         |  CAST(sum(n_tok) AS BIGINT) AS tok_total
         |  FROM f GROUP BY threshold)
         |SELECT threshold, docs_retained, tok_retained,
         |  CAST(docs_retained AS DOUBLE) / CAST(n_docs AS DOUBLE) AS doc_frac,
         |  CASE WHEN tok_total = 0 THEN 0.0
         |       ELSE CAST(tok_retained AS DOUBLE) / CAST(tok_total AS DOUBLE)
         |  END AS tok_frac
         |FROM a ORDER BY threshold""".stripMargin
    },

    // same gopher-lite pass predicate, same Wilson op order (z=1.96,
    // z² spelled 1.96*1.96 so both engines square the same double)
    "source_reliability" ->
      s"""WITH p AS (SELECT source,
         |    CASE WHEN ${LlmQueries.NTOK} >= 5 AND ${LlmQueries.NTOK} <= 10000
         |              AND ${LlmQueries.duckGopherPunct} <= 0.3
         |         THEN 1 ELSE 0 END AS p
         |  FROM documents),
         |a AS (SELECT source, count(*) AS n_docs,
         |        CAST(sum(p) AS BIGINT) AS n_pass FROM p GROUP BY source),
         |w AS (SELECT source, n_docs, n_pass,
         |    CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pr,
         |    CAST(n_docs AS DOUBLE) AS n FROM a)
         |SELECT source, n_docs, n_pass, pr AS pass_rate,
         |  ${Q.duckRnd(
             "(pr + (1.96*1.96) / (2.0*n) - 1.96 * sqrt((pr * (1.0 - pr)" +
               " + (1.96*1.96) / (4.0*n)) / n)) / (1.0 + (1.96*1.96) / n)", 6)}
         |    AS wilson_lb
         |FROM w ORDER BY wilson_lb DESC, source""".stripMargin,

    // same distinct shingles, same min-doc_id first occurrence
    "ngram_novelty" ->
      s"""WITH ${LlmQueries.duckShingleCtes},
         |ds AS (SELECT DISTINCT doc_id, g
         |       FROM (SELECT doc_id, unnest(sh) AS g FROM sh) x),
         |f AS (SELECT doc_id, g,
         |        min(doc_id) OVER (PARTITION BY g) AS first_doc FROM ds)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS novelty_frac
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same lm_score mean_p (shared CTE semantics), same gopher pass
    // predicate, same floor(mean_p·20) binning on identical doubles
    "quality_calibration" ->
      s"""WITH toks AS (SELECT doc_id, ${LlmQueries.TOKS} AS w FROM documents),
         |idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i
         |        FROM toks WHERE len(w) >= 2),
         |pairs AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM idx),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
         |lm AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
         |       FROM c12 JOIN c1 USING (w1)),
         |m AS (SELECT doc_id,
         |    CAST(sum(CAST(${Q.duckRnd("p", 6)} AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS mean_p
         |  FROM pairs JOIN lm USING (w1, w2) GROUP BY doc_id),
         |pq AS (SELECT doc_id,
         |    CASE WHEN ${LlmQueries.duckGopherPass} THEN 1 ELSE 0 END AS pass
         |  FROM documents)
         |SELECT CAST(floor(mean_p * 20) AS BIGINT) AS bucket,
         |  count(*) AS n_docs, CAST(sum(pass) AS BIGINT) AS n_pass,
         |  CAST(sum(pass) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pass_rate
         |FROM m JOIN pq USING (doc_id) GROUP BY 1 ORDER BY bucket""".stripMargin,

    // closed-form signal: the oracle recomputes the window energies
    // the codec round-trip must reproduce exactly
    "audio_rms" ->
      """WITH s AS (SELECT doc_id,
        |    unnest(range(0, 800 + ((doc_id % 5 + 5) % 5) * 160)) AS i
        |  FROM documents),
        |a AS (SELECT doc_id, i // 160 AS w,
        |    ((doc_id * 31 + i * 17) % 2003 + 2003) % 2003 - 1001 AS amp
        |  FROM s),
        |wq AS (SELECT doc_id, w, sum(amp * amp) AS ssq
        |       FROM a GROUP BY doc_id, w)
        |SELECT doc_id, CAST(count(*) * 160 AS BIGINT) AS n_samples,
        |  CAST(16000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        |  count(*) AS n_windows, CAST(sum(ssq) AS BIGINT) AS total_ssq,
        |  CAST(max(ssq) AS BIGINT) AS max_window_ssq
        |FROM wq GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same fingerprint (md5 of sorted tokens), same version predicates
    "dataset_version_diff" ->
      s"""WITH f AS (SELECT lang,
         |    md5(coalesce(array_to_string(list_sort(${LlmQueries.TOKS}), ' '), '')) AS fp,
         |    max(CASE WHEN ((doc_id % 10) + 10) % 10 <> 9 THEN 1 ELSE 0 END)
         |      AS v1,
         |    max(CASE WHEN ((doc_id % 10) + 10) % 10 <> 0 THEN 1 ELSE 0 END)
         |      AS v2
         |  FROM documents GROUP BY lang, fp)
         |SELECT lang,
         |  CAST(sum(CASE WHEN v1 = 1 AND v2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  CAST(sum(CASE WHEN v1 = 0 AND v2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_added,
         |  CAST(sum(CASE WHEN v1 = 1 AND v2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    // plain NTILE in the oracle — DistributedNtile matches NTILE
    // semantics exactly (its spec pins the tile arithmetic)
    "curriculum_schedule" ->
      s"""WITH b AS (SELECT lang, doc_id,
         |    CAST(${LlmQueries.NTOK} AS BIGINT) AS n_tok,
         |    ${LlmQueries.duckQuality} AS q
         |  FROM documents),
         |t AS (SELECT lang, n_tok, q, CAST(ntile(3) OVER (
         |    PARTITION BY lang ORDER BY q, doc_id) AS INTEGER) AS phase
         |  FROM b)
         |SELECT lang, phase, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
         |  min(q) AS q_min, max(q) AS q_max
         |FROM t GROUP BY lang, phase ORDER BY lang, phase""".stripMargin,

    // same unbiased estimator, same int64 per-term products,
    // same decimal(38,0) sums
    "simpson_diversity" ->
      s"""WITH t AS (SELECT source, unnest(${LlmQueries.TOKS}) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT source, term, count(*) AS c FROM t
         |  WHERE term <> '' GROUP BY source, term),
         |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok,
         |    count(*) AS n_types,
         |    sum(CAST(c * (c - 1) AS DECIMAL(38,0))) AS sc2
         |  FROM c GROUP BY source)
         |SELECT source, n_tok, n_types,
         |  CASE WHEN n_tok > 1 THEN ${Q.duckRnd(
        "CAST(sc2 AS DOUBLE) / (CAST(n_tok AS DOUBLE)" +
          " * CAST(n_tok - 1 AS DOUBLE))", 9)} END AS simpson,
         |  CASE WHEN sc2 > 0 THEN ${Q.duckRnd(
        "(CAST(n_tok AS DOUBLE) * CAST(n_tok - 1 AS DOUBLE))" +
          " / CAST(sc2 AS DOUBLE)", 4)} END AS effective_types
         |FROM a ORDER BY source ASC NULLS LAST""".stripMargin,

    // same top-30 pool (tc DESC, term tiebreak), same decimal snaps,
    // same σ=0 ⇒ z=0 convention
    "burrows_delta" ->
      s"""WITH t AS (SELECT source, unnest(${LlmQueries.TOKS}) AS term
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |cn AS (SELECT source, term, count(*) AS c FROM t
         |  WHERE term <> '' GROUP BY source, term),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cn
         |  GROUP BY source),
         |top AS (SELECT term FROM (SELECT term, sum(c) AS tc FROM cn
         |  GROUP BY term ORDER BY tc DESC, term LIMIT $BurrowsK) tt),
         |grid AS (SELECT tot.source, top.term,
         |    CAST(${Q.duckRnd(
        "CAST(coalesce(cn.c, 0) AS DOUBLE) / CAST(tot.n AS DOUBLE)", 12)}
         |      AS DECIMAL(18,12)) AS f
         |  FROM tot CROSS JOIN top
         |  LEFT JOIN cn ON cn.source = tot.source AND cn.term = top.term),
         |st AS (SELECT term, count(*) AS k, sum(f) AS s1,
         |    sum(CAST(${Q.duckRnd(
        "CAST(f AS DOUBLE) * CAST(f AS DOUBLE)", 18)} AS DECIMAL(38,18)))
         |      AS s2
         |  FROM grid GROUP BY term),
         |st2 AS (SELECT term,
         |    CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
         |    sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
         |      - (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
         |        * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)), 0.0)) AS sigma
         |  FROM st),
         |z AS (SELECT g.source, g.term,
         |    CASE WHEN sigma > 0.0
         |      THEN (CAST(f AS DOUBLE) - mu) / sigma ELSE 0.0 END AS z
         |  FROM grid g JOIN st2 USING (term)),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS n_terms,
         |    sum(CAST(${Q.duckRnd("abs(a.z - b.z)", 9)} AS DECIMAL(18,9)))
         |      AS sd
         |  FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT source_a, source_b, n_terms,
         |  ${Q.duckRnd("CAST(sd AS DOUBLE) / CAST(n_terms AS DOUBLE)", 6)}
         |    AS delta
         |FROM p ORDER BY source_a, source_b""".stripMargin,

    // same block width, same distinct-set Jaccard, same fixed-order
    // mean fold (duck list_intersect over pre-distinct lists has no
    // duplicates, matching Spark's array_intersect)
    "texttiling_segments" -> {
      val jacc =
        s"""CAST(len(list_intersect(blk[i + 1], blk[i + 2])) AS DOUBLE) /
           |CAST(len(blk[i + 1]) + len(blk[i + 2])
           |  - len(list_intersect(blk[i + 1], blk[i + 2]))
           |  AS DOUBLE)""".stripMargin.replace("\n", " ")
      s"""WITH t AS (SELECT doc_id, ${LlmQueries.TOKS} AS toks
         |  FROM documents
         |  WHERE text IS NOT NULL AND length(${LlmQueries.NORM}) > 0),
         |b AS (SELECT doc_id, len(toks) AS n_tok,
         |    (len(toks) + ${TtBlock - 1}) // $TtBlock AS n_blocks,
         |    list_transform(
         |      range(0, (len(toks) + ${TtBlock - 1}) // $TtBlock),
         |      i -> list_distinct(list_slice(toks, i * $TtBlock + 1,
         |        (i + 1) * $TtBlock))) AS blk
         |  FROM t),
         |sm AS (SELECT doc_id, n_tok, n_blocks,
         |    CASE WHEN n_blocks >= 2
         |      THEN list_transform(range(0, n_blocks - 1), i -> $jacc)
         |      ELSE [] END AS sims
         |  FROM b)
         |SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
         |  CAST(n_blocks AS BIGINT) AS n_blocks,
         |  CAST(len(list_filter(sims, x -> x < $TtCut)) AS INTEGER)
         |    AS n_boundaries,
         |  CAST(len(list_filter(sims, x -> x < $TtCut)) + 1 AS INTEGER)
         |    AS n_segments,
         |  CASE WHEN n_blocks >= 2 THEN ${Q.duckRnd(
        "list_sum(sims) / CAST(n_blocks - 1 AS DOUBLE)", 6)} END AS mean_sim
         |FROM sm ORDER BY doc_id""".stripMargin
    },

    "code_detect" ->
      s"""WITH pd AS (SELECT coalesce(source, '__null__') AS src,
         |    length(text) AS len,
         |    length(text) - length(regexp_replace(text,
         |      '$CodeSymClass', '', 'g')) AS sym,
         |    1 + length(text) - length(replace(text, chr(10), ''))
         |      AS n_lines,
         |    (length(text) - length(replace(text, chr(10) || ' ', '')))
         |      // 2
         |      + (length(text) - length(replace(text,
         |        chr(10) || chr(9), ''))) // 2
         |      + (CASE WHEN starts_with(text, ' ')
         |        OR starts_with(text, chr(9)) THEN 1 ELSE 0 END)
         |      AS n_indent
         |  FROM documents WHERE text IS NOT NULL),
         |dd AS (SELECT src,
         |    ${Q.duckRnd("CAST(sym AS DOUBLE) / CAST(len AS DOUBLE)", 8)}
         |      AS density,
         |    ${Q.duckRnd(
        "CAST(n_indent AS DOUBLE) / CAST(n_lines AS DOUBLE)", 8)}
         |      AS indent_frac
         |  FROM pd WHERE len > 0),
         |fl AS (SELECT src, density, indent_frac,
         |    density > $CodeDensityCut OR indent_frac > $CodeIndentCut
         |      AS is_code
         |  FROM dd)
         |SELECT src, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_code,
         |  ${Q.duckRnd(
        "CAST(sum(CASE WHEN is_code THEN 1 ELSE 0 END) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} AS code_frac,
         |  ${Q.duckRnd(
        "CAST(sum(CAST(density AS DECIMAL(18,8))) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} AS avg_sym_density,
         |  ${Q.duckRnd(
        "CAST(sum(CAST(indent_frac AS DECIMAL(18,8))) AS DOUBLE)" +
          " / CAST(count(*) AS DOUBLE)", 6)} AS avg_indent_frac
         |FROM fl GROUP BY src ORDER BY src""".stripMargin,

    "tokenizer_compression" ->
      s"""WITH pd AS (SELECT coalesce(source, '__null__') AS src,
         |    CAST(length(text) AS BIGINT) AS chars,
         |    CAST(${LlmQueries.NTOK} AS BIGINT) AS wtok,
         |    CAST(len(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS btok
         |  FROM documents WHERE text IS NOT NULL),
         |agg AS (SELECT src, count(*) AS n_docs,
         |    CAST(sum(chars) AS BIGINT) AS chars,
         |    CAST(sum(wtok) AS BIGINT) AS ws_tokens,
         |    CAST(sum(btok) AS BIGINT) AS bpe_tokens
         |  FROM pd GROUP BY src)
         |SELECT src, n_docs, chars, ws_tokens, bpe_tokens,
         |  CASE WHEN bpe_tokens > 0 THEN ${Q.duckRnd(
        "CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE)", 4)} END
         |    AS chars_per_bpe,
         |  CASE WHEN ws_tokens > 0 THEN ${Q.duckRnd(
        "CAST(chars AS DOUBLE) / CAST(ws_tokens AS DOUBLE)", 4)} END
         |    AS chars_per_word
         |FROM agg ORDER BY src""".stripMargin,

    "source_dup_rate" ->
      s"""WITH fps AS (SELECT doc_id,
         |    coalesce(source, '__null__') AS src,
         |    md5(coalesce(array_to_string(list_sort(${LlmQueries.TOKS}),
         |      ' '), '')) AS fp
         |  FROM documents),
         |k AS (SELECT fp, min(doc_id) AS keeper FROM fps GROUP BY fp)
         |SELECT src, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN fps.doc_id <> k.keeper THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dups,
         |  CAST(count(DISTINCT fps.fp) AS BIGINT) AS n_distinct_fp,
         |  ${Q.duckRnd(
        "CAST(sum(CASE WHEN fps.doc_id <> k.keeper THEN 1 ELSE 0 END)" +
          " AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS dup_rate
         |FROM fps JOIN k USING (fp)
         |GROUP BY src ORDER BY src""".stripMargin,

    "source_overlap" ->
      s"""WITH t0 AS (SELECT coalesce(source, '__null__') AS src,
         |    unnest(${LlmQueries.TOKS}) AS term FROM documents),
         |st AS (SELECT DISTINCT src, term FROM t0 WHERE term <> ''),
         |sizes AS (SELECT src, count(*) AS nt FROM st GROUP BY src),
         |inter AS (SELECT a.src AS sa, b.src AS sb, count(*) AS n_common
         |  FROM st a JOIN st b ON a.term = b.term AND a.src < b.src
         |  GROUP BY a.src, b.src)
         |SELECT sa, sb, za.nt AS na, zb.nt AS nb, n_common,
         |  ${Q.duckRnd(
        "CAST(n_common AS DOUBLE)" +
          " / CAST(za.nt + zb.nt - n_common AS DOUBLE)", 6)} AS jaccard
         |FROM inter JOIN sizes za ON inter.sa = za.src
         |JOIN sizes zb ON inter.sb = zb.src
         |ORDER BY sa, sb""".stripMargin
  )
}
