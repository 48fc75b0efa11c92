package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared conventions for the declared query inventory.
  *
  * Oracle-parity rules (SURVEY.md §7 risks):
  *  - Sums/avgs over double columns are computed on `decimal(18,2)`
  *    casts. Decimal addition is exact and order-independent, so the
  *    result is bit-identical regardless of Spark partition order or
  *    DuckDB's summation order; the final value is cast back to double
  *    (exact) for a stable output schema.
  *  - Single-row arithmetic on doubles (a*b, a-b) is IEEE-exact and
  *    needs no rounding.
  *  - Every query ends in a deterministic ORDER BY (unique key suffix).
  *  - `events.ts` is nanosecond-precision in parquet while Spark
  *    timestamps are microseconds: queries expose event times as epoch
  *    milliseconds (both engines floor identically) instead of raw
  *    timestamps.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Scratch root for queries that materialize intermediate files
    * (json_scan dump, unzip_fanout fixture zip) — tmpdir-derived, not a
    * hard-coded repo path.
    */
  lazy val scratchDir: String = {
    val d = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_scratch")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Scratch subdir for one (query, sf-dir) pair — the shared
    * sanitization for every query that materializes intermediate
    * files, so a collision/cleanup policy change is one edit.
    */
  def scratchPath(prefix: String, d: String): String =
    s"$scratchDir/${prefix}_${d.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** Exact-sum cast: double → decimal(18,2) (test data carries 2dp). */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent exact sum of a 2dp double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact average: decimal sum divided by count in double space. */
  def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c).cast("double")

  /** Cross-engine-deterministic rounding: `floor(x·10ⁿ + 0.5)/10ⁿ`.
    * Spark's `round` resolves half-way cases on the exact decimal
    * expansion of the double (HALF_UP via BigDecimal) while DuckDB
    * rounds the scaled double (half-even rint) — they disagree when
    * `x·10ⁿ` lands exactly on .5 after the multiply. This formula is
    * the same IEEE op sequence in both engines, so results are
    * bit-identical (half-way values round toward +∞). Use for any
    * rounded double output that both engines compute.
    */
  def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    // floor via y − pmod(y, 1.0), NOT functions.floor: Spark's floor
    // returns LONG and silently CLAMPS at ±2^63 — a 6dp snap of any
    // value past ~9.2e12 collapsed to Long.MaxValue/10^6 (caught by
    // kruskal_wallis at sf0.1, whose χ² group terms reach ~5e13).
    // pmod(y, 1.0) ∈ [0, 1) even for negative y, so y − pmod(y, 1.0)
    // = floor(y) and stays a DOUBLE (above 2^53 doubles are integers,
    // where floor is the identity — matching DuckDB's double-native
    // floor in [[duckRnd]]).
    //
    // Known hairline (documented per ADVICE r11): for negative y
    // within < 2^-53 below an integer — reachable only for
    // y ∈ (−2^-53, 0), since at |y| ≥ 1 a double's ulp already
    // exceeds that band — Pmod's `r + 1.0` rounds to exactly 1.0, so
    // the reconstruction takes the y − 1.0 path; at that magnitude
    // y − 1.0 also rounds to the true floor (−1.0), so no divergence
    // has been constructed, but the band is where one would live if
    // Pmod's rounding ever changed. ±Inf is handled explicitly below:
    // the identity alone would give Inf − pmod(Inf,1) = Inf − NaN =
    // NaN while DuckDB's floor keeps Inf.
    val y = c * p + 0.5
    val snapped = (y - pmod(y, lit(1.0))) / p
    when(c === Double.PositiveInfinity || c === Double.NegativeInfinity, c)
      .otherwise(snapped)
  }

  /** DuckDB SQL for the same formula. */
  def duckRnd(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($expr) * $p.0 + 0.5) / $p.0"
  }
}
