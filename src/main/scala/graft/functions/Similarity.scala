package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity and near-duplicate primitives (SURVEY.md §2.11)
  * as a composable Column API.
  *
  * All computations use higher-order functions (`zip_with`,
  * `aggregate`, `transform`) over `ArrayType` columns — no UDFs — and
  * md5 as the hash family so a DuckDB oracle can reproduce results
  * bit-for-bit (md5 is engine-agnostic, unlike Murmur3 `hash()` whose
  * seeds differ across engines).
  *
  * This module is the *specification* of the hash family: `minhash` /
  * `bandKey` here produce exactly the same strings as the relational
  * LSH pipeline in `graft.queries.LlmQueries` (which trades the
  * array-at-a-time shape for posexplode + window shingling and a
  * grouped min — the form that scales past per-row arrays), and
  * `dot`/`cosine` match the codegen'd `FloatVecDot` expression.
  * `SimilaritySpec` pins both equivalences.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0.0 for a zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Word n-gram shingles of a token array: `["a","b","c"]`, n=2 →
    * `["a b","b c"]`. Empty when fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** MinHash signature value for permutation `perm`: the
    * lexicographic minimum over shingles of an 8-hex-char slice of
    * md5("seed:" ++ shingle), where seed = perm/4 and the slice is
    * perm%4 — four permutations per md5, so 8 permutations cost two
    * hashes per shingle. String-min is total-ordered identically in
    * every engine, so no hex→integer conversion is needed. Identical
    * to the construction in LlmQueries.bandTable / its DuckDB oracle.
    */
  def minhash(shinglesCol: Column, perm: Int): Column = {
    val seed = perm / 4
    val off = 1 + 8 * (perm % 4)
    array_min(transform(shinglesCol, s =>
      substring(md5(concat(lit(s"$seed:"), s)), off, 8)))
  }

  /** LSH band key: concatenation of `rowsPerBand` adjacent minhash
    * values starting at permutation `bandStart`. Docs sharing any band
    * key are near-duplicate candidates.
    */
  def bandKey(shinglesCol: Column, bandStart: Int, rowsPerBand: Int): Column =
    concat_ws("|",
      (bandStart until bandStart + rowsPerBand).map(minhash(shinglesCol, _)): _*)

  /** Jaccard similarity of two string-array token sets (distinct). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }
}
