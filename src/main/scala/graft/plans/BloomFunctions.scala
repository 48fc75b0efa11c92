package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.call_function

/** Column-level access to Spark's codegen'd Bloom-filter probe
  * expression — the engine's manual runtime-filter primitive.
  *
  * Spark's own `InjectRuntimeFilter` only plants a Bloom probe when
  * cost heuristics fire on a shuffle-join subtree; `bloom_join`
  * (AnalyticsQueries) builds the filter explicitly from the dimension
  * side via `DataFrameStatFunctions.bloomFilter` (a distributed
  * treeAggregate — the sketch, not the rows, comes to the driver) and
  * probes the fact scan with this expression, so the prune happens at
  * scan time regardless of heuristics. The probe has no false
  * negatives, so the exact join that follows returns identical rows —
  * the Bloom stage only removes rows the join would drop anyway.
  *
  * `BloomFilterMightContain` deserializes the sketch once per task and
  * participates in whole-stage codegen, which is why this beats any
  * UDF-over-broadcast formulation of the same probe.
  */
object BloomFunctions {

  /** Idempotent per-session registration (same pattern as
    * [[VecFunctions.register]]).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_might_contain")))
      reg.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
  }

  /** `bloom` is a binary column (normally a literal of [[serialize]]'s
    * bytes); `value` must be LongType — the same key representation
    * `DataFrameStatFunctions.bloomFilter` ingests for integral columns.
    * Requires `register(spark)` on the owning session first.
    */
  def mightContain(bloom: Column, value: Column): Column =
    call_function("bloom_might_contain", bloom, value)

  /** Wire format of `org.apache.spark.util.sketch.BloomFilter` — the
    * exact bytes `BloomFilterMightContain` deserializes.
    */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
