package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins Q.rnd semantics: floor(x·10ⁿ+0.5)/10ⁿ, the formula that is
  * bit-identical across engines (built-in round is not — see the
  * cross-engine rounding commit).
  */
class RoundingSpec extends SparkSpecBase {
  import spark.implicits._

  test("rnd rounds half-up on exact scaled doubles and matches plain cases") {
    val df = Seq(0.25125, 0.2512500000000001, 0.1, 0.123456, 0.99995, 0.0).toDF("x")
    val got = df.select(Q.rnd($"x", 4).as("r")).as[Double].collect().toSeq
    // The double nearest 0.25125 is slightly BELOW it, so ×10⁴ yields
    // 2512.4999… → 0.2512. DuckDB's floor formula gives exactly the
    // same values for the same doubles (checked against 1.0.0) — the
    // pinned property is engine agreement, not decimal intuition.
    assert(got == Seq(0.2512, 0.2513, 0.1, 0.1235, 1.0, 0.0))
  }

  test("rnd at 6 digits preserves cosine-scale values") {
    val df = Seq(0.987654321, -0.5000005, 1.0).toDF("x")
    val got = df.select(Q.rnd($"x", 6).as("r")).as[Double].collect().toSeq
    assert(math.abs(got(0) - 0.987654) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    // negative half-way rounds toward +inf under this formula — a
    // documented, engine-consistent choice
    assert(math.abs(got(1) - (-0.5)) < 1e-12)
  }
}
