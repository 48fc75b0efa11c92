package graft.queries

import graft.Tables
import graft.functions.{Similarity, TextFunctions => TF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** §2.11 LLM-data-pipeline operators: text analysis, exact and
  * approximate dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
  * similarity (brute-force and bucketed kNN, near-dup pairs).
  *
  * Hashing uses md5 (bit-identical across engines) instead of Spark's
  * Murmur3 `hash()` so every operator has an exact DuckDB oracle.
  * MinHash signatures are lexicographic minima of seeded md5 strings —
  * total order is engine-agnostic, no hex→int conversion needed.
  *
  * Scale design: all candidate generation is key-partitioned (LSH band
  * keys, cluster labels) — never an unblocked cross join over the full
  * corpus; brute-force paths take a bounded query set against the full
  * corpus via broadcast.
  */
object LlmQueries {

  // ---- shared DuckDB oracle fragments --------------------------------
  /** DuckDB replica of TextFunctions.normText (note: DuckDB
    * regexp_replace needs the 'g' flag; Spark replaces all matches).
    */
  private val NORM =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"""
  private val TOKS = s"string_split($NORM, ' ')"
  private val NTOK = s"(CASE WHEN length($NORM) = 0 THEN 0 ELSE len($TOKS) END)"

  /** DuckDB 3-gram shingle list from a token list column `w`. */
  private def duckShingles(w: String): String =
    s"list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])"

  /** DuckDB minhash for permutation seed over shingle list `sh`. */
  private def duckMinhash(sh: String, seed: Int): String =
    s"list_min(list_transform($sh, s -> md5('$seed:' || s)))"

  private def duckBandKey(sh: String, b: Int): String =
    s"${duckMinhash(sh, 2 * b)} || '|' || ${duckMinhash(sh, 2 * b + 1)}"

  /** Candidate-pair CTEs shared by minhash_dedup / ngram_jaccard. */
  private val duckCandidateCtes: String = {
    val bandCases = (0 until 4)
      .map(b => s"WHEN ${b} THEN ${duckBandKey("sh", b)}")
      .mkString(" ")
    s"""toks AS (SELECT doc_id, $TOKS AS w FROM documents WHERE length($NORM) > 0),
       |sh AS (SELECT doc_id, ${duckShingles("w")} AS sh FROM toks WHERE len(w) >= 3),
       |bands AS (SELECT doc_id, b.band,
       |  CASE b.band $bandCases END AS key
       | FROM sh CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** DuckDB cosine between two float-list columns, matching
    * Similarity.cosine's double-precision structure.
    */
  private def duckCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    val nn = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"(CASE WHEN $nn = 0 THEN 0.0 ELSE ${dot(a, b)} / $nn END)"
  }

  // ---- Spark-side shared builders ------------------------------------
  private def sparkCandidates(docs: org.apache.spark.sql.DataFrame) = {
    val toks = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("w"))
      .filter(length(concat_ws(" ", col("w"))) > 0)
    val sh = toks
      .select(col("doc_id"), Similarity.shingles(col("w"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val bands = sh.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => Similarity.bandKey(col("sh"), 2 * b, 2)): _*))
        .as(Seq("band", "key")))
    bands.as("a")
      .join(bands.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  val defs: Map[String, QueryFn] = Map(
    "text_stats" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TF.nTokens($"text")).as("total_tokens"),
          (sum($"n_chars").cast("double") / count(lit(1)).cast("double")).as("avg_chars"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
        .orderBy($"lang")
    }),

    "text_quality" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          length($"text").as("text_len"),
          TF.nTokens($"text").as("n_tokens"),
          round(TF.punctRatio($"text"), 4).as("punct_ratio"),
          round(TF.stopwordRatio($"text"), 4).as("stopword_ratio"),
          TF.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    }),

    "lang_id" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", $"lang",
          TF.langIdHeuristic($"text").as("pred_lang"))
        .orderBy($"doc_id")
    }),

    "token_count" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          TF.nTokens($"text").as("ws_tokens"),
          TF.bpeTokenCount($"text").as("bpe_tokens"))
        .orderBy($"doc_id")
    }),

    "fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TF.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    "exact_dedup" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TF.fingerprint($"text").as("fp"))
        .groupBy($"fp")
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy($"fp")
    }),

    // MinHash + LSH: 8 seeded-md5 permutations, 4 bands × 2 rows;
    // docs sharing a band key become candidate pairs. The join is
    // keyed on (band, key) — partition-parallel, no cross product.
    "minhash_dedup" -> ((s, d) => {
      import s.implicits._
      sparkCandidates(Tables.documents(s, d)).orderBy($"doc_a", $"doc_b")
    }),

    // SimHash (16-bit) over shingle md5s, hex digits decoded
    // arithmetically so the oracle can reproduce exact bit sums.
    "simhash" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", TF.tokens($"text").as("w"))
      val sh = toks
        .select($"doc_id", Similarity.shingles($"w", 3).as("sh"))
        .filter(size($"sh") > 0)
      val ex = sh.select($"doc_id", explode($"sh").as("s"))
        .select($"doc_id", md5($"s").as("h"))
      val digits = (0 until 4).map(k =>
        conv(substring($"h", k + 1, 1), 16, 10).cast("int").as(s"d$k"))
      val withDigits = ex.select(($"doc_id" +: digits): _*)
      val contribs = (0 until 16).map { j =>
        val digit = col(s"d${j / 4}")
        val bit = shiftright(digit, j % 4).bitwiseAND(lit(1))
        sum(when(bit > 0, 1).otherwise(-1)).as(s"s$j")
      }
      withDigits.groupBy($"doc_id").agg(contribs.head, contribs.tail: _*)
        .select($"doc_id",
          (0 until 16).map(j => when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0)))
            .reduce(_ + _).as("simhash"))
        .orderBy($"doc_id")
    }),

    // Jaccard verification of the LSH candidates over 3-gram shingle
    // sets — the classic candidate→verify near-dup pipeline.
    "ngram_jaccard" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val toks = docs.select($"doc_id", TF.tokens($"text").as("w"))
      val sh = toks
        .select($"doc_id", Similarity.shingles($"w", 3).as("sh"))
        .filter(size($"sh") > 0)
      val cand = sparkCandidates(docs)
      cand
        .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
        .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
        .select($"doc_a", $"doc_b", Similarity.jaccard($"sh_a", $"sh_b").as("jacc"))
        .filter($"jacc" >= 0.4)
        .orderBy($"doc_a", $"doc_b")
    }),

    // Embedding near-dup pairs, blocked by cluster label: the join is
    // keyed (label equi-join) so pair generation is per-bucket — the
    // pattern that survives 100 TB where a global cross join cannot.
    "embedding_neardup" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val a = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"), $"label")
      val b = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"), $"label")
      a.join(b, Seq("label"))
        .filter($"vec_a" < $"vec_b")
        .select($"vec_a", $"vec_b",
          round(Similarity.cosine($"emb_a", $"emb_b"), 6).as("cos_sim"))
        .filter($"cos_sim" > 0.8)
        .orderBy($"vec_a", $"vec_b")
    }),

    // Exact brute-force kNN baseline: bounded query set (100 vectors)
    // broadcast against the full corpus.
    "knn_bruteforce" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = broadcast(e.filter($"vec_id" < 100)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb")))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
      q.join(e, $"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id",
          round(Similarity.cosine($"q_emb", $"embedding"), 6).as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"q_id", $"vec_id".as("neighbor_id"), $"rn", $"cos_sim")
        .orderBy($"q_id", $"rn")
    }),

    // IVF-style scale path with the label column as the coarse
    // quantizer (nprobe=1): candidate set shrinks by the bucket count,
    // and the join is a keyed equi-join instead of a cross join.
    "cosine_topk" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val q = broadcast(e.filter($"vec_id" < 100)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"label"))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
      q.join(e, Seq("label"))
        .filter($"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id",
          round(Similarity.cosine($"q_emb", $"embedding"), 6).as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"q_id", $"vec_id".as("neighbor_id"), $"rn", $"cos_sim")
        .orderBy($"q_id", $"rn")
    }),

    // Multimodal column plumbing: binary payload + typed metadata
    // extraction (decode itself is stubbed deterministically — no
    // image libs in this container; see graft.operators.Multimodal
    // for the mapPartitions batch-decode shape).
    "multimodal_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          octet_length($"text").as("n_bytes"),
          md5($"text".cast("binary")).as("checksum"),
          (octet_length($"text") % 640 + 1).as("width"),
          ($"n_chars" % 480 + 1).as("height"),
          when(octet_length($"text") % 3 === 0, "png")
            .when(octet_length($"text") % 3 === 1, "jpg")
            .otherwise("webp").as("fmt"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         | sum($NTOK) AS total_tokens,
         | CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
         | min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id, length(text) AS text_len, $NTOK AS n_tokens,
         | round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |   CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS punct_ratio,
         | round(CASE WHEN $NTOK = 0 THEN 0.0 ELSE
         |   CAST(len(list_filter($TOKS, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len($TOKS) END, 4) AS stopword_ratio,
         | round(greatest(0.0,
         |   least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
         |   + least((CASE WHEN $NTOK = 0 THEN 0.0 ELSE CAST(len(list_filter($TOKS, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len($TOKS) END) * 5.0, 1.0) * 0.5
         |   - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END) * 2.0, 1.0) * 0.3), 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      s"""SELECT doc_id, lang,
         | CASE
         |  WHEN regexp_matches($NORM, '\\bder\\b') OR regexp_matches($NORM, '\\bund\\b') OR regexp_matches($NORM, '\\bdie\\b') THEN 'de'
         |  WHEN regexp_matches($NORM, '\\ble\\b') OR regexp_matches($NORM, '\\bla\\b') OR regexp_matches($NORM, '\\bet\\b') THEN 'fr'
         |  WHEN regexp_matches($NORM, '\\bel\\b') OR regexp_matches($NORM, '\\blos\\b') OR regexp_matches($NORM, '\\buna\\b') THEN 'es'
         |  WHEN regexp_matches($NORM, '\\bthe\\b') OR regexp_matches($NORM, '\\band\\b') OR regexp_matches($NORM, '\\bis\\b') THEN 'en'
         |  ELSE 'unknown' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    "token_count" ->
      s"""SELECT doc_id, $NTOK AS ws_tokens,
         | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "fingerprint" ->
      s"""SELECT doc_id,
         | md5(array_to_string(list_sort($TOKS), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "exact_dedup" ->
      s"""SELECT fp, min(doc_id) AS keeper, count(*) AS n_copies FROM
         | (SELECT doc_id, md5(array_to_string(list_sort($TOKS), ' ')) AS fp
         |  FROM documents) t
         |GROUP BY fp ORDER BY fp""".stripMargin,

    "minhash_dedup" ->
      s"""WITH $duckCandidateCtes
         |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    "simhash" -> {
      val digit = (k: Int) =>
        s"(strpos('0123456789abcdef', substr(h, ${k + 1}, 1)) - 1)"
      val sums = (0 until 16).map { j =>
        s"sum(CASE WHEN (${digit(j / 4)} & ${1 << (j % 4)}) > 0 THEN 1 ELSE -1 END) AS s$j"
      }.mkString(",\n ")
      val combine = (0 until 16)
        .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH toks AS (SELECT doc_id, $TOKS AS w FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("w")} AS sh FROM toks WHERE len(w) >= 3),
         |ex AS (SELECT doc_id, md5(unnest(sh)) AS h FROM sh),
         |bits AS (SELECT doc_id,
         | $sums
         | FROM ex GROUP BY doc_id)
         |SELECT doc_id, $combine AS simhash FROM bits ORDER BY doc_id""".stripMargin
    },

    "ngram_jaccard" ->
      s"""WITH $duckCandidateCtes
         |SELECT doc_a, doc_b, jacc FROM (
         | SELECT c.doc_a, c.doc_b,
         |  CAST(len(list_filter(list_distinct(sa.sh), x -> list_contains(sb.sh, x))) AS DOUBLE)
         |   / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
         |      - len(list_filter(list_distinct(sa.sh), x -> list_contains(sb.sh, x)))) AS jacc
         | FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b) t
         |WHERE jacc >= 0.4 ORDER BY doc_a, doc_b""".stripMargin,

    "embedding_neardup" ->
      s"""SELECT vec_a, vec_b, cos_sim FROM (
         | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos_sim
         | FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id) t
         |WHERE cos_sim > 0.8 ORDER BY vec_a, vec_b""".stripMargin,

    "knn_bruteforce" ->
      s"""SELECT q_id, neighbor_id, rn, cos_sim FROM (
         | SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("q.embedding", "e.embedding")}, 6) AS cos_sim,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY round(${duckCos("q.embedding", "e.embedding")}, 6) DESC, e.vec_id) AS rn
         | FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id
         | WHERE q.vec_id < 100) t
         |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    "cosine_topk" ->
      s"""SELECT q_id, neighbor_id, rn, cos_sim FROM (
         | SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         |  round(${duckCos("q.embedding", "e.embedding")}, 6) AS cos_sim,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY round(${duckCos("q.embedding", "e.embedding")}, 6) DESC, e.vec_id) AS rn
         | FROM embeddings q JOIN embeddings e
         |  ON q.label = e.label AND q.vec_id <> e.vec_id
         | WHERE q.vec_id < 100) t
         |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS checksum,
        | octet_length(encode(text)) % 640 + 1 AS width,
        | n_chars % 480 + 1 AS height,
        | CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
        |      WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpg'
        |      ELSE 'webp' END AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
