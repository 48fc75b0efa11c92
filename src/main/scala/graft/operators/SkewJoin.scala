package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4.3 / 100 TB design note).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). Salting is
  * the explicit fallback for the cases AQE can't fix — e.g. a single
  * hot key that must land in one reducer of a shuffled hash join, or
  * engines/stages where AQE is unavailable.
  *
  * `saltedJoin`: the big (skewed) side gets a uniform salt in
  * [0, buckets); the small side is exploded into `buckets` replicas;
  * the join key becomes (key, salt), spreading each hot key over
  * `buckets` reducers. Output equals the plain inner equi-join
  * (verified by SkewJoinSpec); cost is a `buckets`× blow-up of the
  * small side — use only when the small side is genuinely small.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      buckets: Int): DataFrame = {
    // salt from a row id, not from the key (same-key rows must spread)
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig
      .join(explodedSmall,
        saltedBig(bigKey) === explodedSmall(smallKey) &&
          saltedBig("_salt") === explodedSmall("_salt"))
      .drop("_salt")
  }
}
