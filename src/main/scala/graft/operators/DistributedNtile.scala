package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact NTILE(n) per group without a per-group single-partition sort.
  *
  * `ntile(n) OVER (PARTITION BY g ORDER BY ...)` plans as one sort per
  * group value in one task — fine when groups are balanced, a
  * scale-killer when one group is most of the corpus (ccnet_buckets'
  * dominant-language case: a 100 TB mostly-English corpus would sort
  * nearly every score row in a single task). This operator computes
  * the same tile assignment from a distributed global rank:
  *
  *  1. `repartitionByRange(group, order...)` — contiguous, sorted key
  *     ranges across ALL partitions; a dominant group spans many
  *     partitions instead of collapsing into one.
  *  2. per-(physical partition, group) local `row_number` — each
  *     window group is bounded by the range-partition size, never by
  *     the group size.
  *  3. per-(partition, group) row counts (a #partitions × #groups
  *     relation — broadcastable at any corpus size) give each
  *     partition's rank offset and each group's total via two windows
  *     over that tiny aggregate.
  *  4. global rank = local rank + offset; the tile is then pure
  *     arithmetic, matching Spark/DuckDB NTILE semantics exactly:
  *     bucketSize = cnt div n, the first (cnt % n) buckets take one
  *     extra row. (Rows in the q=0 ELSE-branch cannot exist when
  *     cnt < n, so the integer DIV never sees a zero divisor.)
  *
  * Both exchanges hash/range on keys that include the physical
  * partition id, so no task's input exceeds a range-partition — the
  * skew-free tercile promised in ccnet_buckets' scale note.
  *
  * WindowExec warning note: when `group` is a LITERAL column (the
  * whole-corpus global-order callers: vocab_growth, auc_eval,
  * ks_test, hist_equidepth, pareto_front), Catalyst constant-folds
  * the partitionBy out of the cross-partition carry window (`wPrior`)
  * and WindowExec logs "No Partition Defined". That window runs on
  * the OFFS AGGREGATE — #physical-partitions × #groups rows, a few
  * hundred at any corpus size — never on the data relation, so the
  * single task it plans holds a provably bounded input (the
  * BoundedWindow criterion, enforced structurally here rather than
  * by registration).
  */
object DistributedNtile {

  /** Join the data relation to the broadcast per-(partition, group)
    * stats NULL-SAFELY on the group key: window PARTITION BY treats
    * NULL as a regular group, so the equi-join shorthand
    * (`Seq("__pid", group)`) would silently DROP every null-group row
    * — measured on the null-injected corpus: curriculum_schedule lost
    * its whole lang=NULL stratum vs the oracle's NTILE. `<=>` keeps
    * the broadcast plan (null-safe equality is still a hash-join key
    * in Spark).
    */
  private def joinStats(
      local: DataFrame, offs: DataFrame, group: String): DataFrame =
    local.join(
      broadcast(offs
        .withColumnRenamed("__pid", "__pid2")
        .withColumnRenamed(group, "__g2")),
      col("__pid") === col("__pid2") && col(group) <=> col("__g2"))
      .drop("__pid2", "__g2")

  def withNtile(
      df: DataFrame,
      group: String,
      order: Seq[Column],
      n: Int,
      out: String): DataFrame = {
    require(n >= 1, s"ntile bucket count must be >= 1, got $n")
    val ranged = df
      .repartitionByRange((col(group) +: order): _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid"), col(group)).orderBy(order: _*)
    val local = ranged
      .withColumn("__lr", row_number().over(wLocal).cast("long"))
    val wPrior = Window.partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged
      .groupBy(col("__pid"), col(group))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wPrior), lit(0L)))
      .withColumn("__cnt", sum(col("__c")).over(Window.partitionBy(col(group))))
      .select(col("__pid"), col(group), col("__off"), col("__cnt"))
    joinStats(local, offs, group)
      .withColumn("__r", col("__lr") + col("__off"))
      .withColumn(out, expr(
        s"""CASE WHEN __r <= (__cnt % $n) * (__cnt DIV $n + 1)
           |  THEN (__r - 1) DIV (__cnt DIV $n + 1) + 1
           |  ELSE (__cnt % $n)
           |    + (__r - (__cnt % $n) * (__cnt DIV $n + 1) - 1) DIV (__cnt DIV $n)
           |    + 1 END""".stripMargin).cast("int"))
      .drop("__pid", "__lr", "__off", "__cnt", "__r")
  }

  /** Exact per-group running sum of `value` (inclusive of the current
    * row) in `order`, without a per-group single-partition sort — the
    * same two-phase shape as [[withNtile]]: range partitioning bounds
    * every local window by the range-partition size, and the
    * cross-partition carry comes from a broadcastable
    * (#partitions × #groups) offset relation. Used where a
    * `sum() OVER (PARTITION BY group ORDER BY ...)` would route a
    * dominant group's entire corpus slice through one task
    * (token_budget_trim's dominant-source case — ccnet_buckets'
    * failure mode in a different costume).
    */
  def withRunningSum(
      df: DataFrame,
      group: String,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val ranged = df
      .repartitionByRange((col(group) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val wLocal = Window.partitionBy(col("__pid"), col(group)).orderBy(order: _*)
    val local = ranged
      .withColumn("__ls", sum(col("__v")).over(wLocal))
    val wPrior = Window.partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged
      .groupBy(col("__pid"), col(group))
      .agg(sum(col("__v")).as("__s"))
      .withColumn("__off", coalesce(sum(col("__s")).over(wPrior), lit(0L)))
      .select(col("__pid"), col(group), col("__off"))
    joinStats(local, offs, group)
      .withColumn(out, col("__ls") + col("__off"))
      .drop("__pid", "__v", "__ls", "__off")
  }

  /** Exact per-group running MAX of `value` (EXCLUSIVE of the current
    * row — the prefix-max shape skyline/KS-style scans need: "the
    * best value seen strictly before me in this order"), without a
    * per-group single-partition sort. Same two-phase decomposition as
    * [[withRunningSum]]: max is associative/commutative, so the
    * cross-partition carry is the max over prior partitions' local
    * maxima — a broadcastable (#partitions × #groups) relation. `out`
    * is NULL on each group's first row in `order` (no prior row), the
    * same convention as `max() OVER (... ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`.
    */
  def withRunningMaxExcl(
      df: DataFrame,
      group: String,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val ranged = df
      .repartitionByRange((col(group) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val wLocal = Window.partitionBy(col("__pid"), col(group)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged
      .withColumn("__lm", max(col("__v")).over(wLocal))
    val wPrior = Window.partitionBy(col(group)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged
      .groupBy(col("__pid"), col(group))
      .agg(max(col("__v")).as("__m"))
      .withColumn("__carry", max(col("__m")).over(wPrior))
      .select(col("__pid"), col(group), col("__carry"))
    joinStats(local, offs, group)
      // greatest() ignores NULL operands in both engines, so a NULL
      // local prefix (first row of a partition) or NULL carry (first
      // partition of a group) degrades to the other side; both NULL
      // (the group's very first row) stays NULL.
      .withColumn(out, greatest(col("__lm"), col("__carry")))
      .drop("__pid", "__v", "__lm", "__carry")
  }
}
