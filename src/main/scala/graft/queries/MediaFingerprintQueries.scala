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
    })
  )

  /** Bit term for hash bit j as a BIGINT literal (j = 63 would be the
    * sign bit; these hashes use at most 64 and 8 bits respectively,
    * and bit 63 of the ahash follows simhash's min-long convention).
    */
  private def bitTerm(j: Int): String =
    if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString

  val oracles: Map[String, String] = Map(

    // same pixel formula, same integer block/global means, same strict
    // compare, same bit packing (min-long convention for bit 63 via
    // bitTerm — the simhash-combine precedent; partial sums stay in
    // BIGINT range for the same reason documented there)
    "image_ahash" -> {
      val combine = (0 until 64)
        .map(j => s"WHEN $j THEN ${bitTerm(j)}")
        .mkString(" ")
      s"""WITH px AS (SELECT doc_id, x.range AS x, y.range AS y,
         |    ((doc_id * 7 + x.range * 3 + y.range * 5) % 256 + 256) % 256 AS v
         |  FROM documents, range(0, 16) x, range(0, 16) y),
         |g AS (SELECT doc_id, sum(v) // 256 AS gmean FROM px GROUP BY doc_id),
         |b AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS j, sum(v) // 4 AS bmean
         |  FROM px GROUP BY doc_id, (y // 2) * 8 + (x // 2)),
         |bt AS (SELECT b.doc_id,
         |    sum(CASE b.j $combine END) AS ahash, count(*) AS nset
         |  FROM b JOIN g ON b.doc_id = g.doc_id
         |  WHERE b.bmean > g.gmean GROUP BY b.doc_id)
         |SELECT g.doc_id, CAST(g.gmean AS BIGINT) AS mean_px,
         |  CAST(coalesce(bt.ahash, 0) AS BIGINT) AS ahash,
         |  CAST(coalesce(bt.nset, 0) AS BIGINT) AS n_bits_set
         |FROM g LEFT JOIN bt ON g.doc_id = bt.doc_id
         |ORDER BY g.doc_id""".stripMargin
    },

    // same closed-form PCM, same window energies, same rising-edge bits
    "audio_fingerprint" ->
      s"""WITH s AS (SELECT doc_id,
         |    unnest(range(0, 800 + ((doc_id % 5 + 5) % 5) * 160)) AS i
         |  FROM documents),
         |a AS (SELECT doc_id, i // 160 AS w,
         |    ((doc_id * 31 + i * 17) % 2003 + 2003) % 2003 - 1001 AS amp
         |  FROM s),
         |wq AS (SELECT doc_id, w, sum(amp * amp) AS ssq
         |       FROM a GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, w, ssq,
         |    lead(ssq) OVER (PARTITION BY doc_id ORDER BY w) AS nxt
         |  FROM wq)
         |SELECT doc_id, count(*) AS n_windows,
         |  CAST(coalesce(sum(CASE WHEN nxt > ssq THEN
         |    CASE w ${(0 to 8).map(k => s"WHEN $k THEN ${1L << k}").mkString(" ")} END
         |    ELSE 0 END), 0) AS BIGINT) AS fp,
         |  CAST(coalesce(sum(CASE WHEN nxt > ssq THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_rising
         |FROM dl GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
