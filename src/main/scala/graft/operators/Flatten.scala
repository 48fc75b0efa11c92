package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Recursive flatten of nested DataFrames: structs expand to
  * `parent_child` columns, arrays explode to one row per element, maps
  * become `name_key`/`name_value` (via `map_entries`, then the
  * array+struct paths take over).
  *
  * Re-expresses the intent of the reference's `flatten_df`
  * (/root/reference/airflow-setup/Scripts/transformation_job.py:19-34)
  * as a terminating fix-point. The reference's loop is mis-indented and
  * never terminates on nested input (SURVEY.md §2.9); we implement the
  * commented intent ("iterate until no nested columns remain").
  *
  * Determinism: each pass rewrites the FIRST nested column in schema
  * order, preserving column positions, so multi-array cross-products
  * explode in a fixed order (SURVEY.md §7 risks). Name collisions with
  * pre-existing columns get a `_<n>` suffix rather than silently
  * shadowing.
  *
  * Scale note: this is a driver-side *plan builder* — it only inspects
  * `df.schema` and emits Project/Generate nodes; no data moves until an
  * action runs, and the resulting plan is narrow (no shuffle), so it
  * scales linearly with input size on any cluster.
  */
object Flatten {

  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** First name of `base`, `base_1`, `base_2`, … not present in `taken`. */
  private def fresh(taken: Set[String], base: String): String =
    if (!taken.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(!taken.contains(_)).get

  private def isNested(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: StructType | _: ArrayType | _: MapType => true
      case _                                         => false
    }

  /** Fully flatten `df` until no struct/array/map columns remain.
    *
    * @param outer if true, use `explode_outer` so rows with null/empty
    *              arrays survive (with nulls); default matches the
    *              reference's plain `explode` (row-dropping) semantics.
    */
  def flatten(df: DataFrame, outer: Boolean = false, sep: String = "_"): DataFrame = {
    @annotation.tailrec
    def loop(cur: DataFrame): DataFrame = {
      val fields = cur.schema.fields
      val idx = fields.indexWhere(f => isNested(f.dataType))
      if (idx < 0) cur
      else {
        val f = fields(idx)
        val otherNames = fields.zipWithIndex.collect {
          case (g, i) if i != idx => g.name
        }.toSet
        val next = f.dataType match {
          case st: StructType =>
            var taken = otherNames
            val cols = fields.zipWithIndex.flatMap {
              case (g, i) if i != idx => Seq(col(quoted(g.name)))
              case _ =>
                st.fields.toSeq.map { sf =>
                  val name = fresh(taken, s"${f.name}$sep${sf.name}")
                  taken += name
                  col(s"${quoted(f.name)}.${quoted(sf.name)}").alias(name)
                }
            }
            cur.select(cols.toSeq: _*)
          case _: ArrayType =>
            val gen =
              if (outer) explode_outer(col(quoted(f.name)))
              else explode(col(quoted(f.name)))
            val cols = fields.zipWithIndex.map {
              case (g, i) if i != idx => col(quoted(g.name))
              case _                  => gen.alias(f.name)
            }
            cur.select(cols.toSeq: _*)
          case _: MapType =>
            // map → array<struct<key,value>>; array+struct passes finish it.
            cur.withColumn(f.name, map_entries(col(quoted(f.name))))
        }
        loop(next)
      }
    }
    loop(df)
  }

  /** Names of columns that are still nested (diagnostic / guard). */
  def nestedColumns(df: DataFrame): Seq[String] =
    df.schema.fields.filter(f => isNested(f.dataType)).map(_.name).toSeq
}
