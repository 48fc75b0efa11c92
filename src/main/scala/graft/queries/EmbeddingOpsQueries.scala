package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Embedding-side training-prep operators (thirteenth wave): hard
  * negatives, contrastive triplets, and the Lloyd update step — the
  * pieces that turn the ANN/kmeans plumbing into ML training inputs.
  *
  * Scale/perf design:
  *  - `knn_hard_negatives` is the knn_bruteforce shape (bounded query
  *    set broadcast against the corpus scan, WindowGroupLimit top-k);
  *    the mismatched-label predicate rides the same broadcast probe —
  *    no extra shuffle. At index scale the same query runs against the
  *    IVF cell restriction exactly as knn_ivf does.
  *  - `contrastive_triplets` composes the two top-1 probes in ONE
  *    corpus scan each and joins the (|Q|-row) winners — the triplet
  *    mining step of a contrastive-training data pipeline.
  *  - `kmeans_iterate` is the canonical distributed Lloyd update:
  *    assignment from the memoized [[LlmQueries.ivfCells]] artifact
  *    (shared with knn_ivfpq/kmeans_assign), per-dimension decimal
  *    means via one (cell, pos)-keyed aggregate over the posexploded
  *    corpus — rows ∝ N·dim, the standard linear-cost centroid
  *    update, nothing driver-side.
  */
object EmbeddingOpsQueries {

  import LlmQueries.{withNorm, cosFromNorms, duckCos, ivfCells, IvfK}

  val defs: Map[String, QueryFn] = Map(

    // Hard-negative mining: for each query vector, the most similar
    // vectors with a DIFFERENT label — the negatives that actually
    // move a contrastive loss (easy negatives are already far). Same
    // broadcast-probe + WindowGroupLimit top-k plan as knn_bruteforce.
    "knn_hard_negatives" -> ((s, d) => {
      import s.implicits._
      val e = withNorm(Tables.embeddings(s, d))
      val q = broadcast(e.filter($"vec_id" < 100)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
          $"nrm".as("q_nrm"), $"label".as("q_label")))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
      q.join(e, $"q_label" =!= $"label")
        .select($"q_id", $"vec_id",
          rnd(cosFromNorms($"q_emb", $"embedding", $"q_nrm", $"nrm"), 6).as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"q_id", $"vec_id".as("neg_id"), $"rn", $"cos_sim")
        .orderBy($"q_id", $"rn")
    }),

    // Triplet mining for contrastive training: per anchor, the nearest
    // SAME-label vector (positive) and the nearest DIFFERENT-label
    // vector (hard negative), with the margin the loss would see.
    // Two broadcast probes over one corpus scan each; the final join
    // touches |Q| rows.
    "contrastive_triplets" -> ((s, d) => {
      import s.implicits._
      val e = withNorm(Tables.embeddings(s, d))
      val q = broadcast(e.filter($"vec_id" < 100)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
          $"nrm".as("q_nrm"), $"label".as("q_label")))
      val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
      def top1(cond: org.apache.spark.sql.Column, outId: String, outSim: String) =
        q.join(e, cond)
          .select($"q_id", $"vec_id",
            rnd(cosFromNorms($"q_emb", $"embedding", $"q_nrm", $"nrm"), 6).as("cos_sim"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"q_id", $"vec_id".as(outId), $"cos_sim".as(outSim))
      val pos = top1($"q_label" === $"label" && $"q_id" =!= $"vec_id",
        "pos_id", "pos_sim")
      val neg = top1($"q_label" =!= $"label", "neg_id", "neg_sim")
      pos.join(neg, Seq("q_id"))
        .select($"q_id", $"pos_id", $"neg_id", $"pos_sim", $"neg_sim",
          ($"pos_sim" - $"neg_sim").as("margin"))
        .orderBy($"q_id")
    }),

    // One Lloyd update step from the memoized IVF assignment: new
    // centroid = per-dimension decimal mean of the assigned vectors
    // (6dp-snapped, order-free), reported as the per-cluster shift
    // ‖c_new − c_seed‖ — the convergence signal an iterative k-means
    // driver loops on. Empty cells drop out (no assigned vectors ⇒
    // no update), matching Lloyd's "keep seed" convention by absence.
    "kmeans_iterate" -> ((s, d) => {
      import s.implicits._
      val asg = ivfCells(s, d).select($"vec_id", $"cell")
      val dims = Tables.embeddings(s, d)
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
        .select($"vec_id", $"pos", $"v".cast("double").as("v"))
      val newc = asg.join(dims, Seq("vec_id"))
        .groupBy($"cell", $"pos")
        .agg((sum(rnd($"v", 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("m"))
      val seed = Tables.embeddings(s, d).filter($"vec_id" < IvfK)
        .select($"vec_id".as("cell"), posexplode($"embedding").as(Seq("pos", "sv")))
        .select($"cell", $"pos", $"sv".cast("double").as("sv"))
      val nv = asg.groupBy($"cell").agg(count(lit(1)).as("n_vecs"))
      newc.join(seed, Seq("cell", "pos"))
        .withColumn("sq",
          rnd(($"m" - $"sv") * ($"m" - $"sv"), 12).cast("decimal(28,12)"))
        .groupBy($"cell")
        .agg(sum($"sq").cast("double").as("shift2"))
        .join(nv, Seq("cell"))
        .select($"cell".as("cluster_id"), $"n_vecs",
          rnd(sqrt($"shift2"), 6).as("shift"))
        .orderBy($"cluster_id")
    }),

    "nn_descent_step" -> nnDescentDef,

    // Farthest-point-sampling coreset (k=3, unrolled): the classic
    // k-center seeding for diverse exemplar selection — each round is
    // ONE corpus scan against a broadcast 1-row selection, the argmax
    // is a TakeOrdered(1), and min-distances update in place (the
    // kmeans++/coreset pattern; more rounds = more unrolled scans,
    // linear each). Distances snap to 6dp before comparison so the
    // argmax tiebreak is stable cross-engine.
    "fps_coreset" -> ((s, d) => {
      import s.implicits._
      val e = withNorm(Tables.embeddings(s, d))
      def pick(dists: org.apache.spark.sql.DataFrame) =
        dists.orderBy($"dist".desc, $"vec_id").limit(1)
      val seed = broadcast(e.filter($"vec_id" === 0L)
        .select($"embedding".as("s_emb"), $"nrm".as("s_nrm")))
      val d1 = e.crossJoin(seed)
        .select($"vec_id", $"embedding", $"nrm",
          rnd(lit(1.0) - cosFromNorms($"embedding", $"s_emb", $"nrm", $"s_nrm"), 6)
            .as("dist"))
      val f1 = broadcast(pick(d1)
        .select($"vec_id".as("f1_id"), $"embedding".as("f1_emb"),
          $"nrm".as("f1_nrm"), $"dist".as("f1_dist")))
      val d2 = d1.crossJoin(f1)
        .select($"vec_id",
          least($"dist",
            rnd(lit(1.0) - cosFromNorms($"embedding", $"f1_emb", $"nrm", $"f1_nrm"), 6))
            .as("dist"))
      val f2 = pick(d2)
      val r0 = e.filter($"vec_id" === 0L)
        .select(lit(0).as("k"), $"vec_id", lit(0.0).as("sel_dist"))
      val r1 = f1.select(lit(1).as("k"), $"f1_id".as("vec_id"),
        $"f1_dist".as("sel_dist"))
      val r2 = f2.select(lit(2).as("k"), $"vec_id", $"dist".as("sel_dist"))
      r0.unionAll(r1).unionAll(r2).orderBy($"k")
    }),

    // Semi-supervised cluster-then-label propagation: seed labels
    // (vec_id % 4 == 0) vote within each IVF cell, majority wins
    // (smallest label on ties), unlabeled members inherit the cell's
    // winner (-1 where a cell holds no seed). Reads the memoized
    // [[LlmQueries.ivfCells]] index artifact — the propagation
    // itself is one grouped vote + one broadcastable (#cells)
    // winner join; nothing pairwise at any corpus size.
    "label_propagation" -> ((s, d) => {
      import s.implicits._
      val asg = ivfCells(s, d).select($"vec_id", $"cell")
      // a NULL label cannot vote (and its nulls-first/last tiebreak
      // would diverge between engines anyway)
      val seeds = asg
        .join(Tables.embeddings(s, d).select($"vec_id", $"label"), Seq("vec_id"))
        .filter($"vec_id" % 4 === 0 && $"label".isNotNull)
      val votes = seeds.groupBy($"cell", $"label").agg(count(lit(1)).as("nv"))
      val w = Window.partitionBy($"cell").orderBy($"nv".desc, $"label")
      val win = votes.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"cell", $"label".as("pred_label"), $"nv")
      asg.filter($"vec_id" % 4 =!= 0)
        .join(broadcast(win), Seq("cell"), "left")
        .select($"vec_id", $"cell",
          coalesce($"pred_label", lit(-1)).as("pred_label"),
          coalesce($"nv", lit(0L)).as("n_votes"))
        .orderBy($"vec_id")
    }),

    // Embedding-space drift canary: per-label centroid shift between
    // the vec_id-parity halves of the store — the "did the encoder
    // or the data move" check a production embedding pipeline runs
    // per refresh (mixture_drift's idea lifted to vector space).
    // Both half-centroids ride ONE (label, pos)-keyed aggregate
    // (conditional decimal sums); the shift collapse is label-keyed.
    "embedding_drift" -> ((s, d) => {
      import s.implicits._
      val dims = Tables.embeddings(s, d)
        .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "xv")))
        .select($"vec_id", $"label", $"pos", $"xv".cast("double").as("x"),
          (pmod($"vec_id", lit(2L)) === 0L).as("ev"))
      val m = dims.groupBy($"label", $"pos")
        .agg(
          (sum(when($"ev", $"x".cast("decimal(18,8)"))).cast("double") /
            sum(when($"ev", 1L).otherwise(0L)).cast("double")).as("ce"),
          (sum(when(!$"ev", $"x".cast("decimal(18,8)"))).cast("double") /
            sum(when(!$"ev", 1L).otherwise(0L)).cast("double")).as("co"))
      val shift = m.groupBy($"label")
        .agg(sum(rnd(($"ce" - $"co") * ($"ce" - $"co"), 12)
          .cast("decimal(28,12)")).cast("double").as("s2"))
      val counts = Tables.embeddings(s, d)
        .select($"label", (pmod($"vec_id", lit(2L)) === 0L).as("ev"))
        .groupBy($"label")
        .agg(sum(when($"ev", 1L).otherwise(0L)).as("n_even"),
          sum(when(!$"ev", 1L).otherwise(0L)).as("n_odd"))
      shift.join(counts, Seq("label"))
        .select($"label", $"n_even", $"n_odd",
          rnd(sqrt($"s2"), 6).as("centroid_shift"))
        .orderBy($"label")
    }),

    // Maximal-marginal-relevance diversification (Carbonell &
    // Goldstein 1998 — public): greedy top-5 selection maximizing
    // λ·relevance − (1−λ)·max-similarity-to-already-selected — the
    // retrieval-diversity step between ANN recall and a context
    // window. Greedy is inherently sequential in k, so the unroll is
    // the fps_coreset chaining: each step broadcasts its 1-row
    // argmax (TakeOrdered, never a global sort) and folds the new
    // pick's similarity into every remaining candidate's running max
    // — lazy frames, no driver collect. Scale shape: MMR always runs
    // AFTER retrieval on a bounded candidate pool (here vec_id <
    // MmrPoolN mirrors the retrieval cut), so every pass is a
    // broadcast probe over a bounded relation regardless of corpus
    // size. rel/sim are 6dp-snapped BEFORE the argmax in both
    // engines; the score is one IEEE sequence over snapped inputs
    // with λ and 1−λ as independent literals (never computed from
    // each other — 1.0 − 0.7 is not 0.3 in IEEE).
    "mmr_diversify" -> ((s, d) => {
      import s.implicits._
      val e = withNorm(Tables.embeddings(s, d)).filter($"vec_id" < MmrPoolN)
      val qv = broadcast(e.filter($"vec_id" === 0L)
        .select($"embedding".as("q_emb"), $"nrm".as("q_nrm")))
      val base = e.crossJoin(qv)
        .select($"vec_id", $"embedding", $"nrm",
          rnd(cosFromNorms($"embedding", $"q_emb", $"nrm", $"q_nrm"), 6)
            .as("rel"))
        .withColumn("msim", lit(0.0)) // max over the empty selected set
      val (_, picks) =
        (1 to 5).foldLeft((base, Seq.empty[org.apache.spark.sql.DataFrame])) {
          case ((cand, sel), step) =>
            val pick = cand
              .withColumn("score",
                lit(MmrLambda) * $"rel" - lit(MmrMu) * $"msim")
              .orderBy($"score".desc, $"vec_id").limit(1)
            val pb = broadcast(pick.select($"vec_id".as("s_id"),
              $"embedding".as("s_emb"), $"nrm".as("s_nrm")))
            val next = cand.crossJoin(pb).filter($"vec_id" =!= $"s_id")
              .select($"vec_id", $"embedding", $"nrm", $"rel",
                greatest($"msim",
                  rnd(cosFromNorms($"embedding", $"s_emb", $"nrm", $"s_nrm"),
                    6)).as("msim"))
            (next,
              sel :+ pick.select(lit(step).as("k"), $"vec_id", $"rel",
                $"msim", $"score"))
        }
      picks.reduce(_.unionAll(_)).orderBy($"k")
    }),

    // Johnson-Lindenstrauss random projection (wave 42): project the
    // 64-dim embeddings onto RpK=8 Rademacher directions and rank
    // vector pairs by PROJECTED distance — the dimensionality-
    // reduction candidate generator (project once per vector, then
    // pair scoring costs 8 mults instead of 64). The ±1 sign matrix
    // is md5-derived ONCE in Scala and embedded as literals in BOTH
    // engines' plans (no cross-engine hash arithmetic); each
    // projection is one codegen'd vec_dot against a constant sign
    // vector — a pure scan projection, zero shuffles until the
    // bounded 200-vector eval join. d2 sums are explicit 8-term
    // left-associated chains, the same IEEE sequence both engines.
    "rp_project" -> ((s, d) => {
      import s.implicits._
      graft.plans.VecFunctions.register(s)
      val projCols = (0 until RpK).map { j =>
        (graft.plans.VecFunctions.vecDot($"embedding",
          array(rpSigns(j).map(v => lit(v.toFloat)): _*)) / sqrt(lit(8.0)))
          .as(s"p$j")
      }
      val proj = Tables.embeddings(s, d)
        .where($"vec_id" < RpEvalN && $"embedding".isNotNull)
        .select(($"vec_id" +: (graft.plans.VecFunctions
          .vecDot($"embedding", $"embedding").as("sd") +: projCols)): _*)
      val a = proj.columns.foldLeft(proj)((df, c) =>
        df.withColumnRenamed(c, s"a_$c"))
      val b = proj.columns.foldLeft(proj)((df, c) =>
        df.withColumnRenamed(c, s"b_$c"))
      val emb = Tables.embeddings(s, d)
        .where($"vec_id" < RpEvalN && $"embedding".isNotNull)
      val d2p = (0 until RpK)
        .map(j => (col(s"a_p$j") - col(s"b_p$j")) *
          (col(s"a_p$j") - col(s"b_p$j")))
        .reduce(_ + _)
      a.join(b, $"a_vec_id" < $"b_vec_id")
        .join(emb.select($"vec_id".as("a_vec_id"), $"embedding".as("ea")),
          Seq("a_vec_id"))
        .join(emb.select($"vec_id".as("b_vec_id"), $"embedding".as("eb")),
          Seq("b_vec_id"))
        .select($"a_vec_id".as("vec_a"), $"b_vec_id".as("vec_b"),
          rnd(d2p, 6).as("d2_proj"),
          rnd($"a_sd" + $"b_sd" - lit(2.0) *
            graft.plans.VecFunctions.vecDot($"ea", $"eb"), 6).as("d2_true"))
        .orderBy($"d2_proj", $"vec_a", $"vec_b")
        .limit(20)
    }),

    // DBSCAN role assignment (wave 46, Ester et al. 1996's core/
    // border/noise trichotomy): a vector is CORE with ≥ MinPts
    // ε-neighbors, BORDER if not core but adjacent to a core, NOISE
    // otherwise. The ε-neighborhood is embNearPairs' label-blocked
    // snapped-cosine join at its own radius (cos > 0.25 — the
    // fixtures' same-label cosines top out at ~0.45, so semdedup's
    // 0.8 would make every fixture vector trivially noise); blocking
    // on the label keeps candidate generation bucketed, never
    // all-pairs — the same 100 TB answer as the dedup family. After
    // the pair join: two degree aggregates + one semi-join.
    "dbscan_core" -> ((s, d) => {
      import s.implicits._
      val e = LlmQueries.withNorm(Tables.embeddings(s, d))
      val ea = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"),
        $"nrm".as("nrm_a"), $"label")
      val eb = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"),
        $"nrm".as("nrm_b"), $"label")
      val pairs = ea.join(eb, Seq("label"))
        .filter($"vec_a" < $"vec_b")
        .filter(rnd(LlmQueries.cosFromNorms($"emb_a", $"emb_b",
          $"nrm_a", $"nrm_b"), 6) > DbscanEps)
        .select($"vec_a", $"vec_b")
      val sym = pairs.unionAll(
        pairs.select($"vec_b".as("vec_a"), $"vec_a".as("vec_b")))
      val deg = sym.groupBy($"vec_a").agg(count(lit(1)).as("n_neighbors"))
        .withColumnRenamed("vec_a", "vec_id")
      val da = Tables.embeddings(s, d).select($"vec_id")
        .join(deg, Seq("vec_id"), "left")
        .withColumn("n_neighbors", coalesce($"n_neighbors", lit(0L)))
      val core = da.where($"n_neighbors" >= DbscanMinPts)
        .select($"vec_id".as("c_id"))
      val hcn = sym.join(core, sym("vec_b") === core("c_id"))
        .select(sym("vec_a").as("vec_id")).distinct()
        .withColumn("has_core_nb", lit(1))
      da.join(hcn, Seq("vec_id"), "left")
        .select($"vec_id", $"n_neighbors",
          when($"n_neighbors" >= DbscanMinPts, "core")
            .when($"has_core_nb" === 1, "border")
            .otherwise("noise").as("role"))
        .orderBy($"vec_id")
    })
  )

  /** DBSCAN core threshold (ε-neighbors, self excluded) and the
    * cosine radius, mirrored in the oracle.
    */
  private val DbscanMinPts = 3L
  private val DbscanEps = 0.25

  /** rp_project constants: projection width, eval-pair vector bound. */
  private val RpK = 8
  private val RpDim = 64
  private val RpEvalN = 200L

  /** Deterministic Rademacher sign matrix: sign(j)(i) = ±1 off the
    * low bit of md5("rp:i:j") — computed once HERE and embedded as
    * literals into both the Spark plan and the DuckDB oracle, so the
    * two engines never have to agree on hash arithmetic.
    */
  private val rpSigns: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    IndexedSeq.tabulate(RpK, RpDim) { (j, i) =>
      val h = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }
  }

  /** MMR candidate-pool bound (the retrieval cut the pool mirrors)
    * and the relevance/diversity trade-off. λ and μ = 1−λ are
    * SEPARATE literals mirrored digit-for-digit in the oracle.
    */
  private val MmrPoolN = 200L
  private val MmrLambda = 0.7
  private val MmrMu = 0.3

  /** NN-Descent neighbor-of-neighbor step (Dong et al. 2011 —
    * public): given the current label-blocked top-3 kNN digraph,
    * propose the NON-edge pairs that share ≥ 2 common neighbors,
    * ranked by neighborhood Jaccard — the refinement move that makes
    * kNN-graph construction converge without all-pairs work. Work:
    * one bucketed top-k probe (embedding_neardup's label-blocked
    * shape, WindowGroupLimit) + a wedge join on a ≤(k+indegree)-
    * degree graph — Σdeg² stays tiny because the base graph is
    * k-regular out of the gate. The LSH candidate graph is the wrong
    * substrate for this (its components are cliques — no non-edge
    * wedges exist, verified at both fixture scales); the kNN digraph
    * is the one NN-Descent actually runs on.
    */
  private def nnDescentDef: QueryFn = (s, d) => {
    import s.implicits._
    val e = withNorm(Tables.embeddings(s, d))
    val a = e.select($"vec_id".as("src"), $"embedding".as("ea"),
      $"nrm".as("na"), $"label")
    val b = e.select($"vec_id".as("dst"), $"embedding".as("eb"),
      $"nrm".as("nb"), $"label")
    val w = Window.partitionBy($"src").orderBy($"cos_sim".desc, $"dst")
    val knn = a.join(b, Seq("label"))
      .filter($"src" =!= $"dst")
      .select($"src", $"dst",
        rnd(cosFromNorms($"ea", $"eb", $"na", $"nb"), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"src", $"dst")
    val sym = knn.unionAll(knn.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
    val deg = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
    val cn = sym.select($"src".as("c"), $"dst".as("x"))
      .join(sym.select($"src".as("c"), $"dst".as("y")), Seq("c"))
      .filter($"x" < $"y")
      .groupBy($"x", $"y").agg(count(lit(1)).as("cn"))
      .filter($"cn" >= 2)
    cn.join(sym.select($"src".as("x"), $"dst".as("y")), Seq("x", "y"),
        "left_anti")
      .join(deg.select($"src".as("x"), $"deg".as("deg_a")), Seq("x"))
      .join(deg.select($"src".as("y"), $"deg".as("deg_b")), Seq("y"))
      .select($"x".as("vec_a"), $"y".as("vec_b"), $"cn", $"deg_a", $"deg_b",
        rnd($"cn".cast("double") /
          ($"deg_a" + $"deg_b" - $"cn").cast("double"), 6).as("nb_jacc"))
      .orderBy($"nb_jacc".desc, $"vec_a", $"vec_b")
      .limit(50)
  }

  /** Assignment CTEs shared with the kmeans_assign oracle (same d2 op
    * order, same (d2, cluster_id) tiebreak).
    */
  private val duckAssignCtes: String =
    s"""c AS (SELECT vec_id AS cell, embedding AS cent
       |      FROM embeddings WHERE vec_id < $IvfK),
       |a AS (SELECT e.vec_id, c.cell,
       |  ${LlmQueries.duckDot("e.embedding", "e.embedding")}
       |    - 2*${LlmQueries.duckDot("e.embedding", "c.cent")}
       |    + ${LlmQueries.duckDot("c.cent", "c.cent")} AS d2
       |  FROM embeddings e CROSS JOIN c),
       |r AS (SELECT vec_id, cell, d2,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |  FROM a),
       |asg AS (SELECT vec_id, cell FROM r WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    // same cosine op order; distances 6dp-snapped BEFORE the argmax
    // in both engines, same (dist desc, vec_id) tiebreak
    "fps_coreset" ->
      s"""WITH s AS (SELECT embedding AS s_emb FROM embeddings WHERE vec_id = 0),
         |d1 AS (SELECT e.vec_id, e.embedding,
         |  ${Q.duckRnd("1.0 - " + duckCos("e.embedding", "s.s_emb"), 6)} AS dist
         | FROM embeddings e CROSS JOIN s),
         |f1 AS (SELECT vec_id, embedding, dist FROM d1
         |  ORDER BY dist DESC, vec_id LIMIT 1),
         |d2 AS (SELECT d1.vec_id,
         |  least(d1.dist,
         |    ${Q.duckRnd("1.0 - " + duckCos("d1.embedding", "f1.embedding"), 6)})
         |    AS dist
         | FROM d1 CROSS JOIN f1),
         |f2 AS (SELECT vec_id, dist FROM d2 ORDER BY dist DESC, vec_id LIMIT 1)
         |SELECT CAST(0 AS INTEGER) AS k, CAST(0 AS BIGINT) AS vec_id,
         |  CAST(0.0 AS DOUBLE) AS sel_dist
         |UNION ALL SELECT CAST(1 AS INTEGER), vec_id, dist FROM f1
         |UNION ALL SELECT CAST(2 AS INTEGER), vec_id, dist FROM f2
         |ORDER BY k""".stripMargin,

    // same ‖x−c‖² assignment text as kmeans_assign's oracle (the ONE
    // centroid convention), then the majority vote with the same
    // (votes desc, label) tiebreak
    "label_propagation" ->
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS cent
         |           FROM embeddings
         |           WHERE vec_id < $IvfK AND embedding IS NOT NULL),
         |a AS (SELECT e.vec_id, c.cell,
         |  ${LlmQueries.duckDot("e.embedding", "e.embedding")}
         |    - 2*${LlmQueries.duckDot("e.embedding", "c.cent")}
         |    + ${LlmQueries.duckDot("c.cent", "c.cent")} AS d2
         |  FROM embeddings e CROSS JOIN c
         |  WHERE e.embedding IS NOT NULL),
         |r AS (SELECT vec_id, cell,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
         |  FROM a),
         |asg AS (SELECT vec_id, cell FROM r WHERE rn = 1),
         |seeds AS (SELECT s.vec_id, s.cell, em.label
         |  FROM asg s JOIN embeddings em USING (vec_id)
         |  WHERE s.vec_id % 4 = 0 AND em.label IS NOT NULL),
         |v AS (SELECT cell, label, count(*) AS nv
         |  FROM seeds GROUP BY cell, label),
         |w AS (SELECT cell, label, nv,
         |  row_number() OVER (PARTITION BY cell ORDER BY nv DESC, label) AS rn
         |  FROM v),
         |win AS (SELECT cell, label AS pred_label, nv FROM w WHERE rn = 1)
         |SELECT a.vec_id, a.cell,
         | coalesce(win.pred_label, -1) AS pred_label,
         | CAST(coalesce(win.nv, 0) AS BIGINT) AS n_votes
         |FROM asg a LEFT JOIN win USING (cell)
         |WHERE a.vec_id % 4 <> 0 ORDER BY a.vec_id""".stripMargin,

    // same cosine op order, same (sim desc, vec_id) tiebreak
    "knn_hard_negatives" ->
      s"""SELECT q_id, neg_id, rn, cos_sim FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS neg_id,
         |    ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)} AS cos_sim,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)}
         |        DESC, e.vec_id) AS INTEGER) AS rn
         |  FROM embeddings q JOIN embeddings e ON q.label <> e.label
         |  WHERE q.vec_id < 100) t
         |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,

    "contrastive_triplets" ->
      s"""WITH pos AS (SELECT q_id, vec_id AS pos_id, cos_sim AS pos_sim FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)} AS cos_sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)}
         |        DESC, e.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings e
         |    ON q.label = e.label AND q.vec_id <> e.vec_id
         |  WHERE q.vec_id < 100) t WHERE rn = 1),
         |neg AS (SELECT q_id, vec_id AS neg_id, cos_sim AS neg_sim FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id,
         |    ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)} AS cos_sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${Q.duckRnd(duckCos("q.embedding", "e.embedding"), 6)}
         |        DESC, e.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings e ON q.label <> e.label
         |  WHERE q.vec_id < 100) t WHERE rn = 1)
         |SELECT pos.q_id, pos_id, neg_id, pos_sim, neg_sim,
         |  pos_sim - neg_sim AS margin
         |FROM pos JOIN neg ON pos.q_id = neg.q_id
         |ORDER BY pos.q_id""".stripMargin,

    // same assignment, same 6dp-snapped decimal per-dim means, same
    // 12dp-snapped squared shift terms (1-based dims internally — the
    // join convention only has to be self-consistent)
    "kmeans_iterate" ->
      s"""WITH $duckAssignCtes,
         |dims AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |           CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
         |nc AS (SELECT cell, pos,
         |    CAST(sum(CAST(${Q.duckRnd("v", 6)} AS DECIMAL(18,6))) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS m
         |  FROM asg JOIN dims USING (vec_id) GROUP BY cell, pos),
         |seed AS (SELECT vec_id AS cell, generate_subscripts(embedding, 1) AS pos,
         |           CAST(unnest(embedding) AS DOUBLE) AS sv
         |         FROM embeddings WHERE vec_id < $IvfK),
         |sh AS (SELECT nc.cell,
         |    sum(CAST(${Q.duckRnd("(m - sv) * (m - sv)", 12)}
         |      AS DECIMAL(28,12))) AS s2
         |  FROM nc JOIN seed ON nc.cell = seed.cell AND nc.pos = seed.pos
         |  GROUP BY nc.cell),
         |nv AS (SELECT cell, count(*) AS n_vecs FROM asg GROUP BY cell)
         |SELECT sh.cell AS cluster_id, nv.n_vecs,
         |  ${Q.duckRnd("sqrt(CAST(s2 AS DOUBLE))", 6)} AS shift
         |FROM sh JOIN nv ON sh.cell = nv.cell
         |ORDER BY cluster_id""".stripMargin,

    // same label-blocked top-3 digraph (rounded-cosine rank, vec_id
    // tiebreak), same symmetrized wedge counts and Jaccard op order
    "nn_descent_step" ->
      s"""WITH knn AS (SELECT src, dst FROM (
         |    SELECT a.vec_id AS src, b.vec_id AS dst,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${Q.duckRnd(duckCos("a.embedding", "b.embedding"), 6)}
         |          DESC, b.vec_id) AS rn
         |    FROM embeddings a JOIN embeddings b
         |      ON a.label = b.label AND a.vec_id <> b.vec_id) t
         |  WHERE rn <= 3),
         |sym AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM knn
         |  UNION ALL SELECT dst AS src, src AS dst FROM knn) u),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |cnb AS (SELECT a.dst AS x, b.dst AS y, count(*) AS cn
         |  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
         |  GROUP BY a.dst, b.dst HAVING count(*) >= 2),
         |ne AS (SELECT x, y, cn FROM cnb LEFT JOIN sym
         |  ON cnb.x = sym.src AND cnb.y = sym.dst WHERE sym.src IS NULL)
         |SELECT x AS vec_a, y AS vec_b, CAST(cn AS BIGINT) AS cn,
         |  CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
         |  ${Q.duckRnd(
             "CAST(cn AS DOUBLE) / CAST(da.deg + db.deg - cn AS DOUBLE)", 6)}
         |    AS nb_jacc
         |FROM ne JOIN deg da ON ne.x = da.src JOIN deg db ON ne.y = db.src
         |ORDER BY nb_jacc DESC, vec_a, vec_b LIMIT 50""".stripMargin,

    // same conditional decimal half-means, same snapped shift
    "embedding_drift" ->
      s"""WITH dm AS (SELECT vec_id, label,
         |    generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS x,
         |    ((vec_id % 2) + 2) % 2 = 0 AS ev
         |  FROM embeddings),
         |m AS (SELECT label, pos,
         |    CAST(sum(CASE WHEN ev THEN CAST(x AS DECIMAL(18,8)) END)
         |      AS DOUBLE) /
         |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS DOUBLE) AS ce,
         |    CAST(sum(CASE WHEN NOT ev THEN CAST(x AS DECIMAL(18,8)) END)
         |      AS DOUBLE) /
         |    CAST(sum(CASE WHEN NOT ev THEN 1 ELSE 0 END) AS DOUBLE) AS co
         |  FROM dm GROUP BY label, pos),
         |sh AS (SELECT label,
         |    CAST(sum(CAST(${Q.duckRnd("(ce - co) * (ce - co)", 12)}
         |      AS DECIMAL(28,12))) AS DOUBLE) AS s2
         |  FROM m GROUP BY label),
         |c AS (SELECT label,
         |    CAST(sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_even,
         |    CAST(sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0 THEN 0 ELSE 1 END)
         |      AS BIGINT) AS n_odd
         |  FROM embeddings GROUP BY label)
         |SELECT sh.label, c.n_even, c.n_odd,
         |  ${Q.duckRnd("sqrt(s2)", 6)} AS centroid_shift
         |FROM sh JOIN c ON sh.label = c.label ORDER BY sh.label""".stripMargin,

    // same snapped rel/sim, same greedy chaining, same independent
    // 0.7 / 0.3 literals, same (score desc, vec_id) argmax tiebreak
    "mmr_diversify" -> {
      val greedy = (2 to 5).map { i =>
        s"""p${i - 1} AS (SELECT vec_id, embedding, rel, msim,
           |  0.7 * rel - 0.3 * msim AS score FROM c${i - 1}
           |  ORDER BY score DESC, vec_id LIMIT 1),
           |c$i AS (SELECT c.vec_id, c.embedding, c.rel,
           |  greatest(c.msim,
           |    ${Q.duckRnd(duckCos("c.embedding", "p.embedding"), 6)})
           |    AS msim
           | FROM c${i - 1} c CROSS JOIN p${i - 1} p
           | WHERE c.vec_id <> p.vec_id)""".stripMargin
      }.mkString(",\n")
      val out = (1 to 5).map(i =>
        s"SELECT CAST($i AS INTEGER) AS k, vec_id, rel, msim, score FROM p$i")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id < $MmrPoolN),
         |q AS (SELECT embedding AS q_emb FROM e WHERE vec_id = 0),
         |c1 AS (SELECT e.vec_id, e.embedding,
         |  ${Q.duckRnd(duckCos("e.embedding", "q.q_emb"), 6)} AS rel,
         |  0.0 AS msim
         | FROM e CROSS JOIN q),
         |$greedy,
         |p5 AS (SELECT vec_id, embedding, rel, msim,
         |  0.7 * rel - 0.3 * msim AS score FROM c5
         |  ORDER BY score DESC, vec_id LIMIT 1)
         |$out
         |ORDER BY k""".stripMargin
    },

    // same literal sign matrix (generated by the same Scala code),
    // same left-to-right dot order, same 8-term left-assoc d2 chain
    "rp_project" -> {
      def sgnList(j: Int): String =
        "[" + rpSigns(j).map(v => s"$v.0").mkString(", ") + "]"
      val projLegs = (0 until RpK).map { j =>
        s"${LlmQueries.duckDot("embedding", sgnList(j))} / sqrt(8.0) AS p$j"
      }.mkString(",\n         |    ")
      val d2p = (0 until RpK)
        .map(j => s"(a.p$j - b.p$j) * (a.p$j - b.p$j)")
        .mkString(" + ")
      s"""WITH pr AS (SELECT vec_id,
         |    ${LlmQueries.duckDot("embedding", "embedding")} AS sd,
         |    $projLegs
         |  FROM embeddings WHERE vec_id < $RpEvalN
         |    AND embedding IS NOT NULL)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${Q.duckRnd(d2p, 6)} AS d2_proj,
         |  ${Q.duckRnd("a.sd + b.sd - 2.0 * " +
        LlmQueries.duckDot("ea.embedding", "eb.embedding"), 6)} AS d2_true
         |FROM pr a JOIN pr b ON a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |ORDER BY d2_proj, vec_a, vec_b LIMIT 20""".stripMargin
    },

    // same label-blocked snapped-cosine neighborhood at the DBSCAN
    // radius, same MinPts cut
    "dbscan_core" ->
      s"""WITH p AS (SELECT vec_a, vec_b FROM (
         |   SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${Q.duckRnd(LlmQueries.duckCos("a.embedding", "b.embedding"), 6)}
         |      AS cos_sim
         |   FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id) t
         |  WHERE cos_sim > $DbscanEps),
         |sym AS (SELECT vec_a, vec_b FROM p
         |        UNION ALL SELECT vec_b AS vec_a, vec_a AS vec_b FROM p),
         |deg AS (SELECT vec_a AS vec_id, count(*) AS n FROM sym
         |  GROUP BY vec_a),
         |da AS (SELECT e.vec_id, CAST(coalesce(deg.n, 0) AS BIGINT)
         |    AS n_neighbors
         |  FROM embeddings e LEFT JOIN deg ON e.vec_id = deg.vec_id),
         |core AS (SELECT vec_id FROM da WHERE n_neighbors >= $DbscanMinPts),
         |hcn AS (SELECT DISTINCT sym.vec_a AS vec_id FROM sym
         |  JOIN core ON sym.vec_b = core.vec_id)
         |SELECT da.vec_id, da.n_neighbors,
         |  CASE WHEN da.n_neighbors >= $DbscanMinPts THEN 'core'
         |       WHEN hcn.vec_id IS NOT NULL THEN 'border'
         |       ELSE 'noise' END AS role
         |FROM da LEFT JOIN hcn ON da.vec_id = hcn.vec_id
         |ORDER BY da.vec_id""".stripMargin
  )
}
