package graft.queries

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Twenty-second wave (text-relation half) — cross-document span
  * matching and positional co-occurrence: the two corpus relations
  * that need token/char POSITION, which the shingle/term families
  * deliberately discard.
  *
  * Scale/perf design:
  *  - `winnow_matches` is the MOSS-style shared-span detector over
  *    the winnowing fingerprints ([[CorpusOpsQueries.winnowWindows]]):
  *    docs pair only through a shared fingerprint value, and
  *    fingerprints held by more than [[FpDocCap]] docs are dropped
  *    BEFORE the self-join (boilerplate spans carry no plagiarism
  *    signal — the LSH mega-bucket lesson applied to spans), so
  *    pair work is Σ min(docs-per-fp, cap)², linear in corpus size.
  *  - `cooccur_window` counts term pairs within a ±2 token window as
  *    TWO equi-joins on (doc_id, position) — never a per-doc
  *    position×position join with a distance filter, which would be
  *    quadratic in document length. Top-30 is a TakeOrdered.
  */
object TextMatchQueries {

  /** Max docs sharing a fingerprint before it is discarded as
    * boilerplate (mirrored into the oracle).
    */
  private val FpDocCap = 64

  /** Minimum shared fingerprints for a reported match (mirrored). */
  private val MinShared = 2

  val defs: Map[String, QueryFn] = Map(
    // Shared-fingerprint document pairs: how many winnowing
    // fingerprints two docs have in common, plus containment of the
    // smaller doc's fingerprint set — the actionable "these two share
    // literal spans" report (vs minhash's whole-doc similarity).
    "winnow_matches" -> ((s, d) => {
      import s.implicits._
      val fps = CorpusOpsQueries.winnowFps(s, d)
      val keep = fps.groupBy($"fp").agg(count(lit(1)).as("nd"))
        .filter($"nd" >= 2 && $"nd" <= FpDocCap)
        .select($"fp")
      val pruned = fps.join(keep, Seq("fp"))
      val pairs = pruned.select($"fp", $"doc_id".as("doc_a"))
        .join(pruned.select($"fp", $"doc_id".as("doc_b")), Seq("fp"))
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= MinShared)
      // set sizes come straight off the cached per-doc sketch — array
      // arithmetic, not a re-aggregation of the exploded rows
      val sizes = CorpusOpsQueries.winnowDocTable(s, d)
        .select($"doc_id", size($"fps").cast("long").as("n_fp"))
      pairs
        .join(sizes.select($"doc_id".as("doc_a"), $"n_fp".as("nfa")), Seq("doc_a"))
        .join(sizes.select($"doc_id".as("doc_b"), $"n_fp".as("nfb")), Seq("doc_b"))
        .select($"doc_a", $"doc_b", $"n_shared",
          rnd($"n_shared".cast("double") /
            least($"nfa", $"nfb").cast("double"), 6).as("containment"))
        .orderBy($"n_shared".desc, $"doc_a", $"doc_b")
    }),

    // Term co-occurrence within a forward window of 2 tokens — the
    // skip-gram/PMI substrate at window grain (collocation_pmi is the
    // adjacent-bigram special case). Positions come from ONE
    // posexplode; the window materializes as two (doc_id, pos)-keyed
    // equi-joins, so cost is 2·corpus-tokens however long any single
    // document is.
    "cooccur_window" -> ((s, d) => {
      import s.implicits._
      val pos = Tables.documents(s, d)
        .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("p", "term")))
        .filter($"term" =!= "")
      // term_b sits `off` positions AFTER term_a: align b's position
      // back onto a's so the window is two (doc_id, p) equi-joins
      def shifted(off: Int) = pos.select(
        $"doc_id", ($"p" - off).as("p"), $"term".as("term_b"))
      val pairs = pos.join(shifted(1), Seq("doc_id", "p"))
        .unionAll(pos.join(shifted(2), Seq("doc_id", "p")))
      pairs.groupBy($"term".as("term_a"), $"term_b")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"term_a", $"term_b")
        .limit(30)
    }))

  import LlmQueries.TOKS

  val oracles: Map[String, String] = Map(
    "winnow_matches" ->
      s"""WITH ${CorpusOpsQueries.duckWinnowCtes},
         |fps AS (SELECT DISTINCT doc_id, fp FROM f WHERE p >= 4),
         |keep AS (SELECT fp FROM fps GROUP BY fp
         |  HAVING count(*) >= 2 AND count(*) <= $FpDocCap),
         |pr AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS n_shared
         |  FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |  HAVING count(*) >= $MinShared),
         |sz AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id)
         |SELECT doc_a, doc_b, n_shared,
         |  ${Q.duckRnd(
             "CAST(n_shared AS DOUBLE) / CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE)",
             6)} AS containment
         |FROM pairs
         | JOIN sz sa ON sa.doc_id = doc_a
         | JOIN sz sb ON sb.doc_id = doc_b
         |ORDER BY n_shared DESC, doc_a, doc_b""".stripMargin,

    // 1-based duck positions vs 0-based Spark posexplode — the
    // offset cancels inside the equi-join's position arithmetic
    "cooccur_window" ->
      s"""WITH pos AS (SELECT doc_id,
         |    unnest(range(1, len($TOKS) + 1)) AS p,
         |    unnest($TOKS) AS term
         |  FROM documents),
         |t AS (SELECT doc_id, p, term FROM pos WHERE term <> ''),
         |pairs AS (
         |  SELECT a.term AS term_a, b.term AS term_b
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.p = a.p + 1
         |  UNION ALL
         |  SELECT a.term, b.term
         |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.p = a.p + 2)
         |SELECT term_a, term_b, count(*) AS n
         |FROM pairs GROUP BY term_a, term_b
         |ORDER BY n DESC, term_a, term_b LIMIT 30""".stripMargin)
}
