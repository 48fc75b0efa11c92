package graft.queries

import graft.Tables
import Q.QueryFn

/** Sixteenth wave, media leg — perceptual fingerprints over REAL
  * codec round-trips (the image_decode_stats / audio_rms design
  * extended from decode-stats to dedup-grade signatures): the
  * synthetic media is closed-form in doc_id, so every hash bit is
  * arithmetically recomputable by the DuckDB oracle, and a broken
  * decoder, header parse, or bit-packing bug is a driver-file hash
  * mismatch — not a spec footnote.
  *
  * Scale/perf design: both ops are two mapPartitions stages (encode,
  * then the decode + hash under test) with zero shuffles before the
  * output sort — scan-parallel at any corpus size, codec initialized
  * once per partition. The hashes are the join keys an image/audio
  * dedup would bucket on (exact-match groupBy — the cheapest dedup
  * class), so the signature layout, not just the stats, is under
  * oracle.
  */
object MediaFingerprintQueries {

  /** Hamming verification threshold for image_neardup (bits of 64).
    * Mirrored into the oracle. 6 keeps the synthetic gradient space's
    * near-shift structure (hamming 1-6 pairs exist at every fixture
    * scale, so the oracle compare is never vacuously empty) while
    * rejecting the unrelated-image mass at 20+ bits. Declared ahead
    * of [[oracles]] because the SQL string interpolates it eagerly at
    * object init.
    */
  private val HammingMax = 6

  /** Hamming verification threshold for audio_neardup (bits of the
    * ≤ 9-bit rising-edge fingerprint). 2 with three 3-bit bands:
    * pigeonhole guarantees any pair within hamming 2 shares at least
    * one intact band, so banded candidate generation is COMPLETE at
    * this threshold. Mirrored into the oracle.
    */
  private val AudioHammingMax = 2

  val defs: Map[String, QueryFn] = Map(

    // Average-hash (aHash) over a deterministic 16×16 grayscale
    // gradient PNG: pixel(x,y) = (id·7 + x·3 + y·5) mod 256, encoded
    // and decoded through real javax.imageio. Hash bit j (= by·8+bx)
    // is set iff the 2×2 block's integer mean exceeds the global
    // integer mean — strict inequality, integer division, so every
    // bit is exact cross-engine arithmetic.
    "image_ahash" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select($"doc_id").as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { id =>
            val n = 16
            val img = new java.awt.image.BufferedImage(
              n, n, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < n) {
              var x = 0
              while (x < n) {
                val v = java.lang.Math
                  .floorMod(id * 7 + x.toLong * 3 + y.toLong * 5, 256L).toInt
                img.setRGB(x, y, v << 16 | v << 8 | v)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { case (id, bytes) =>
            // the REAL decode under test
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            val n = img.getWidth
            val px = Array.tabulate(n, n)((x, y) => img.getRGB(x, y) & 0xFF)
            var gsum = 0L
            var y = 0
            while (y < n) {
              var x = 0
              while (x < n) { gsum += px(x)(y); x += 1 }
              y += 1
            }
            val gmean = gsum / (n * n)
            var hash = 0L
            var nSet = 0
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                val bsum = px(2 * bx)(2 * by).toLong + px(2 * bx + 1)(2 * by) +
                  px(2 * bx)(2 * by + 1) + px(2 * bx + 1)(2 * by + 1)
                if (bsum / 4 > gmean) {
                  hash |= 1L << (by * 8 + bx); nSet += 1
                }
                bx += 1
              }
              by += 1
            }
            (id, gmean, hash, nSet.toLong)
          }
        }
        .toDF("doc_id", "mean_px", "ahash", "n_bits_set")
        .orderBy($"doc_id")
    }),

    // Energy-delta audio fingerprint over the audio_rms signal: decode
    // the WAV through real javax.sound, compute the per-160-sample
    // window energies, and set bit k iff energy(k+1) > energy(k) —
    // the Shazam-family "energy landmark" idea reduced to its
    // integer-exact core (no FFT — transcendental-free by design).
    "audio_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select($"doc_id").as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 800 + java.lang.Math.floorMod(id, 5L).toInt * 160
            val pcm = new Array[Byte](n * 2)
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
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val nw = n / 160
            val energies = new Array[Long](nw)
            var w = 0L
            var i = 0
            while (i < n) {
              val v = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xFF)).toShort.toLong
              w += v * v
              if (i % 160 == 159) { energies(i / 160) = w; w = 0L }
              i += 1
            }
            var fp = 0L
            var nRise = 0L
            var k = 0
            while (k < nw - 1) {
              if (energies(k + 1) > energies(k)) { fp |= 1L << k; nRise += 1 }
              k += 1
            }
            (id, nw.toLong, fp, nRise)
          }
        }
        .toDF("doc_id", "n_windows", "fp", "n_rising")
        .orderBy($"doc_id")
    }),

    // Perceptual image near-dup pairing (round 11, wave 34): the
    // dedup JOIN the aHash signatures exist for — simhash_neardup's
    // banded-Hamming design applied to images. The join runs in
    // SIGNATURE space, not instance space: hashes group first
    // (count + min-doc representative), the 64-bit hash splits into
    // four 16-bit bands, equal-band signatures pair, and candidates
    // verify by bit_count(xor) <= [[HammingMax]]. Instance
    // multiplicity rides along as n_a·n_b pair counts — a million
    // copies of two near-identical images is ONE output row, never a
    // 10¹² instance-pair explosion (the property that makes image
    // dedup joinable at 100 TB: band buckets scale with DISTINCT
    // signatures / 2^16, and the downstream instance expansion is a
    // keyed join against the hash groups). All-integer end to end.
    "image_neardup" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val h = defs("image_ahash")(s, d)
        .groupBy($"ahash")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("rep_doc"))
      val bands = h.select($"ahash", $"n_docs", $"rep_doc",
        explode(array((0 until 4).map(j => struct(lit(j).as("band"),
          shiftright($"ahash", 16 * j).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("bk"))
        .select($"ahash", $"n_docs", $"rep_doc", $"bk.band", $"bk.key")
      val cand = bands.as("a").join(bands.as("b"), Seq("band", "key"))
        .filter($"a.ahash" < $"b.ahash")
        .select($"a.ahash".as("ahash_a"), $"b.ahash".as("ahash_b"),
          $"a.n_docs".as("n_a"), $"b.n_docs".as("n_b"),
          $"a.rep_doc".as("rep_a"), $"b.rep_doc".as("rep_b"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count($"ahash_a".bitwiseXOR($"ahash_b")).cast("int"))
        .filter($"hamming" <= HammingMax)
        .select($"ahash_a", $"ahash_b", $"hamming", $"n_a", $"n_b",
          $"rep_a", $"rep_b", ($"n_a" * $"n_b").as("n_pairs"))
        .orderBy($"hamming", $"ahash_a", $"ahash_b")
    }),

    // Acoustic near-dup pairing (wave 35): image_neardup's
    // signature-space design applied to the audio fingerprints —
    // clips pair only WITHIN an n_windows length class (different
    // durations are never near-dups), the ≤ 9-bit rising-edge
    // fingerprint splits into three 3-bit bands, equal-band
    // signatures pair, and bit_count(xor) ≤ [[AudioHammingMax]]
    // verifies. The join runs over DISTINCT (n_windows, fp)
    // signatures with instance multiplicity riding as n_a·n_b — the
    // signature space is bounded (5 length classes × 2^8), so the
    // candidate join's cost is CONSTANT in corpus size; only the
    // signature grouping scan grows. All-integer end to end.
    "audio_neardup" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val h = defs("audio_fingerprint")(s, d)
        .groupBy($"n_windows", $"fp")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("rep_doc"))
      val bands = h.select($"n_windows", $"fp", $"n_docs", $"rep_doc",
        explode(array((0 until 3).map(j => struct(lit(j).as("band"),
          shiftright($"fp", 3 * j).bitwiseAND(lit(7L))
            .as("key"))): _*)).as("bk"))
        .select($"n_windows", $"fp", $"n_docs", $"rep_doc",
          $"bk.band", $"bk.key")
      val cand = bands.as("a").join(bands.as("b"),
          Seq("n_windows", "band", "key"))
        .filter(col("a.fp") < col("b.fp"))
        .select($"n_windows", col("a.fp").as("fp_a"), col("b.fp").as("fp_b"),
          col("a.n_docs").as("n_a"), col("b.n_docs").as("n_b"),
          col("a.rep_doc").as("rep_a"), col("b.rep_doc").as("rep_b"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count($"fp_a".bitwiseXOR($"fp_b")).cast("int"))
        .filter($"hamming" <= AudioHammingMax)
        .select($"n_windows", $"fp_a", $"fp_b", $"hamming", $"n_a", $"n_b",
          $"rep_a", $"rep_b", ($"n_a" * $"n_b").as("n_pairs"))
        .orderBy($"n_windows", $"hamming", $"fp_a", $"fp_b")
    })
  )

  /** Bit term for hash bit j as a BIGINT literal (j = 63 would be the
    * sign bit; these hashes use at most 64 and 8 bits respectively,
    * and bit 63 of the ahash follows simhash's min-long convention).
    */
  private def bitTerm(j: Int): String =
    if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString

  /** Per-doc aHash CTE chain (same pixel formula, same integer
    * block/global means, same strict compare, same bit packing with
    * the min-long convention for bit 63 via [[bitTerm]] — the
    * simhash-combine precedent; partial sums stay in BIGINT range
    * for the same reason documented there). ONE definition shared by
    * the image_ahash and image_neardup oracles so the signature
    * arithmetic cannot diverge between them.
    */
  private val duckAhashCtes: String = {
    val combine = (0 until 64)
      .map(j => s"WHEN $j THEN ${bitTerm(j)}")
      .mkString(" ")
    s"""px AS (SELECT doc_id, x.range AS x, y.range AS y,
       |    ((doc_id * 7 + x.range * 3 + y.range * 5) % 256 + 256) % 256 AS v
       |  FROM documents, range(0, 16) x, range(0, 16) y),
       |g AS (SELECT doc_id, sum(v) // 256 AS gmean FROM px GROUP BY doc_id),
       |b AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS j, sum(v) // 4 AS bmean
       |  FROM px GROUP BY doc_id, (y // 2) * 8 + (x // 2)),
       |bt AS (SELECT b.doc_id,
       |    sum(CASE b.j $combine END) AS ahash, count(*) AS nset
       |  FROM b JOIN g ON b.doc_id = g.doc_id
       |  WHERE b.bmean > g.gmean GROUP BY b.doc_id),
       |ah AS (SELECT g.doc_id, CAST(g.gmean AS BIGINT) AS gmean,
       |  CAST(coalesce(bt.ahash, 0) AS BIGINT) AS ahash,
       |  CAST(coalesce(bt.nset, 0) AS BIGINT) AS nset
       | FROM g LEFT JOIN bt ON g.doc_id = bt.doc_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "image_ahash" ->
      s"""WITH $duckAhashCtes
         |SELECT doc_id, gmean AS mean_px, ahash, nset AS n_bits_set
         |FROM ah ORDER BY doc_id""".stripMargin,

    // same signature grouping, same four 16-bit bands, same
    // xor/bit_count verification at the same threshold
    "image_neardup" ->
      s"""WITH $duckAhashCtes,
         |h AS (SELECT ahash, count(*) AS n_docs, min(doc_id) AS rep_doc
         |  FROM ah GROUP BY ahash),
         |bd AS (SELECT h.ahash, h.n_docs, h.rep_doc, j.range AS band,
         |    (h.ahash >> (16 * j.range)) & 65535 AS key
         |  FROM h, range(0, 4) j),
         |cand AS (SELECT DISTINCT a.ahash AS ahash_a, b.ahash AS ahash_b,
         |    a.n_docs AS n_a, b.n_docs AS n_b,
         |    a.rep_doc AS rep_a, b.rep_doc AS rep_b
         |  FROM bd a JOIN bd b
         |   ON a.band = b.band AND a.key = b.key AND a.ahash < b.ahash)
         |SELECT ahash_a, ahash_b,
         |  CAST(bit_count(xor(ahash_a, ahash_b)) AS INTEGER) AS hamming,
         |  n_a, n_b, rep_a, rep_b, n_a * n_b AS n_pairs
         |FROM cand
         |WHERE bit_count(xor(ahash_a, ahash_b)) <= $HammingMax
         |ORDER BY hamming, ahash_a, ahash_b""".stripMargin,

    // same closed-form PCM, same window energies, same rising-edge bits
    "audio_fingerprint" ->
      s"""WITH $duckAudioFpCtes
         |SELECT doc_id, n_windows, fp, n_rising
         |FROM afp ORDER BY doc_id""".stripMargin,

    // same per-length-class signature grouping, same three 3-bit
    // bands, same xor/bit_count verification at the same threshold
    "audio_neardup" ->
      s"""WITH $duckAudioFpCtes,
         |h AS (SELECT n_windows, fp, count(*) AS n_docs,
         |  min(doc_id) AS rep_doc FROM afp GROUP BY n_windows, fp),
         |bd AS (SELECT h.n_windows, h.fp, h.n_docs, h.rep_doc,
         |    j.range AS band, (h.fp >> (3 * j.range)) & 7 AS key
         |  FROM h, range(0, 3) j),
         |cand AS (SELECT DISTINCT a.n_windows, a.fp AS fp_a, b.fp AS fp_b,
         |    a.n_docs AS n_a, b.n_docs AS n_b,
         |    a.rep_doc AS rep_a, b.rep_doc AS rep_b
         |  FROM bd a JOIN bd b
         |   ON a.n_windows = b.n_windows AND a.band = b.band
         |   AND a.key = b.key AND a.fp < b.fp)
         |SELECT n_windows, fp_a, fp_b,
         |  CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming,
         |  n_a, n_b, rep_a, rep_b, n_a * n_b AS n_pairs
         |FROM cand
         |WHERE bit_count(xor(fp_a, fp_b)) <= $AudioHammingMax
         |ORDER BY n_windows, hamming, fp_a, fp_b""".stripMargin
  )

  /** Per-doc audio fingerprint CTE chain (same closed-form PCM, same
    * window energies, same rising-edge bit packing) — ONE definition
    * shared by the audio_fingerprint and audio_neardup oracles so
    * the signature arithmetic cannot diverge between them. Yields
    * `afp(doc_id, n_windows, fp, n_rising)`.
    */
  private lazy val duckAudioFpCtes: String =
    s"""s AS (SELECT doc_id,
       |    unnest(range(0, 800 + ((doc_id % 5 + 5) % 5) * 160)) AS i
       |  FROM documents),
       |a AS (SELECT doc_id, i // 160 AS w,
       |    ((doc_id * 31 + i * 17) % 2003 + 2003) % 2003 - 1001 AS amp
       |  FROM s),
       |wq AS (SELECT doc_id, w, sum(amp * amp) AS ssq
       |       FROM a GROUP BY doc_id, w),
       |dl AS (SELECT doc_id, w, ssq,
       |    lead(ssq) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
       |  FROM wq),
       |afp AS (SELECT doc_id, count(*) AS n_windows,
       |  CAST(coalesce(sum(CASE WHEN nxt > ssq THEN
       |    CASE w ${(0 to 8).map(k => s"WHEN $k THEN ${1L << k}").mkString(" ")} END
       |    ELSE 0 END), 0) AS BIGINT) AS fp,
       |  CAST(coalesce(sum(CASE WHEN nxt > ssq THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_rising
       | FROM dl GROUP BY doc_id)""".stripMargin
}
