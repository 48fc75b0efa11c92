package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / Z-order curve keys for multi-dimensional data layout.
  *
  * Sorting a table by the interleaved-bit key clusters rows that are
  * close in BOTH dimensions into the same files, so parquet per-file
  * min/max statistics become tight on x AND y simultaneously — a
  * predicate on either column prunes files, where a plain sort gives
  * pruning on the leading column only. At 100 TB this is the
  * difference between scanning a full partition and opening a handful
  * of row groups for a two-dimensional slice (e.g. user × time,
  * quality × length).
  *
  * The key is pure shift/mask/multiply column arithmetic — fully
  * inside whole-stage codegen, no UDF — and deterministic, so layout
  * jobs are reproducible.
  */
object ZOrder {

  /** Interleave the low 16 bits of x (even bit positions) and y (odd
    * positions) into one non-negative long.
    */
  def zkey(x: Column, y: Column): Column =
    (0 until 16).map { j =>
      shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
}
