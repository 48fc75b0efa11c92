package graft.functions

/** Driver/executor-side deterministic hash-to-float mapping shared by
  * the seeded pseudo-random constructions (LSH hyperplanes, the
  * multimodal feature stub). Seeded md5, not a PRNG: every executor,
  * run, and test agrees on the values without shared state.
  */
object Hashing {

  /** First 4 digest bytes → [0, 1) float. */
  def unitFloat(digest: Array[Byte]): Float = {
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    (v.toDouble / (1L << 32).toDouble).toFloat
  }

  /** md5 of `bytes` mapped to [0, 1), reusing the caller's digest. */
  def md5UnitFloat(md: java.security.MessageDigest, bytes: Array[Byte]): Float = {
    val h = md.digest(bytes)
    md.reset()
    unitFloat(h)
  }
}
