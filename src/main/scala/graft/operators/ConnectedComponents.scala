package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the cluster-resolution step of a near-duplicate
  * dedup pipeline (each component of the candidate graph collapses to
  * its minimum vertex id, the canonical "keeper").
  *
  * Spark-first shape: one keyed join + one aggregate per round, state
  * never leaves the cluster, and the convergence test is an exact
  * decimal aggregate (labels only decrease, so the label sum strictly
  * drops on any change — sum equality IS the fixpoint). Converges in
  * at most `diameter` rounds; near-dup components are star/clique
  * shaped (diameter 2–4). For adversarial long-chain graphs the
  * round-efficient variant is large-star/small-star alternation
  * (O(log n) rounds) with the same per-round plan shape — not needed
  * for the dedup use case, and the iteration cap fails LOUDLY rather
  * than returning a silently under-merged labeling.
  *
  * Round economy (the dominant cost at toy scale is per-job overhead,
  * not data):
  *  - labels SEED with the one-hop minimum `least(id, min(neighbor))`
  *    — a full propagation round folded into the initial
  *    materialization, so star-shaped clusters are already converged
  *    before the loop runs.
  *  - each loop iteration chains TWO propagation rounds into one job
  *    and checks convergence once — labels are monotone
  *    non-increasing, so an unchanged sum across a double-round is
  *    still exactly the fixpoint, at half the job/aggregate count.
  *
  * @param vertices one column `id` (any numeric type)
  * @param edges    columns `src`, `dst` (directed input; symmetrized
  *                 internally, self-loops harmless)
  * @param checkpointDir when set, per-round lineage truncation uses
  *                 RELIABLE `checkpoint()` into this directory
  *                 (HDFS/object-store path on a cluster) instead of
  *                 `localCheckpoint()` — executor loss mid-iteration
  *                 recovers from the checkpoint files rather than
  *                 failing the job, which is the right trade for a
  *                 many-round computation on preemptible executors.
  *                 Default None keeps the executor-local fast path
  *                 (no distributed-FS round trip per round). Reliable
  *                 checkpoint files are deleted by the ContextCleaner
  *                 only when `spark.cleaner.referenceTracking
  *                 .cleanCheckpoints` is true; otherwise clean the
  *                 directory after the job.
  * @return (id, component) where component = min id of the component.
  *         The returned Dataset IS the persisted result: callers that
  *         `unpersist()` it free every cached block this operator
  *         holds (intermediate rounds are already released
  *         internally).
  */
object ConnectedComponents {

  def minLabel(vertices: DataFrame, edges: DataFrame, maxIter: Int = 30,
      checkpointDir: Option[String] = None): DataFrame =
    withCheckpointDir(vertices, checkpointDir) { truncate =>
      minLabelImpl(vertices, edges, maxIter, truncate)
    }

  /** Scoped checkpoint-dir override: sets the SparkContext checkpoint
    * directory for the duration of `body` and afterwards restores the
    * previous checkpoint ROOT (or unsets it), so this per-call
    * parameter does not leak into the application's own checkpoint
    * configuration. `getCheckpointDir` reports the RESOLVED location —
    * root plus a per-set UUID subdirectory — so the restore re-sets
    * the root, under which Spark mints a fresh UUID subdir; existing
    * checkpointed RDDs keep their absolute paths and stay readable.
    * (Concurrent calls with different dirs on one context still
    * race — that is a SparkContext-global setting; give such jobs
    * separate sessions.)
    * The truncator handed to `body` persists before a RELIABLE
    * checkpoint so the round's lineage is computed once and the
    * checkpoint files are written from the cached blocks — without it
    * Spark recomputes the whole round a second time for the write —
    * then drops the scratch cache. The local fast path is
    * localCheckpoint: lazy (riding the caller's own action) unless
    * `localEager` asks for the eager variant.
    */
  private def withCheckpointDir[T](df: DataFrame, checkpointDir: Option[String],
      localEager: Boolean = false)(body: (DataFrame => DataFrame) => T): T = {
    val sc = df.sparkSession.sparkContext
    val prevRoot = sc.getCheckpointDir.map { resolved =>
      val p = new org.apache.hadoop.fs.Path(resolved)
      Option(p.getParent).map(_.toString).getOrElse(resolved)
    }
    checkpointDir.foreach(sc.setCheckpointDir)
    def truncate(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) {
        d.persist()
        try d.checkpoint() // eager: computes once into cache, writes from it
        finally d.unpersist()
      } else d.localCheckpoint(eager = localEager)
    try body(truncate)
    // Option(null) unsets, matching the pre-call state when none was
    // configured
    finally if (checkpointDir.isDefined) sc.setCheckpointDir(prevRoot.orNull)
  }

  private def minLabelImpl(vertices: DataFrame, edges: DataFrame, maxIter: Int,
      truncate: DataFrame => DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    def propagate(labels: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_min"))
      labels
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
    }
    // sum(...) is null on an empty frame: an empty graph is a valid
    // input (zero components), not an NPE. The aggregate doubles as
    // the materializer of whatever persisted frame it runs over —
    // rounds materialize strictly one at a time, because a multi-frame
    // convergence action (e.g. cross-joining two round-sums) submits
    // independent stages that race to compute the SAME not-yet-cached
    // upstream partitions concurrently, duplicating the expensive
    // candidate-pair build (measured: slower than the job it saves).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    // Lineage discipline: each round's plan references the previous
    // round twice (the join and the neighbor aggregate), so without
    // TRUNCATION the logical plan doubles per round — exponential
    // driver-side planning cost within 2-3 double-rounds when the
    // input lineage is heavy (the candidate-pair build carries the
    // whole shingle→band→self-join pipeline). Every round therefore
    // truncates with LAZY localCheckpoint(eager = false): the logical
    // plan collapses to a LogicalRDD immediately, but materialization
    // still rides the round's own labelSum job — lineage truncation
    // without the extra eager-checkpoint job per round the previous
    // formulation paid. (With `checkpointDir` set, truncation is a
    // persist + eager reliable checkpoint() instead — one extra job
    // per round, but compute-once and fault-tolerant; see
    // withCheckpointDir.)
    val seed = vertices
      .join(sym.groupBy(col("src")).agg(min(col("dst")).as("nbr_min")),
        vertices("id") === col("src"), "left")
      .select(vertices("id"),
        least(col("id"), coalesce(col("nbr_min"), col("id"))).as("lbl"))
    // ONE job materializes sym + seed's truncated RDD and computes its
    // sum; every loop round likewise materializes through its sum.
    var labels: DataFrame = truncate(seed)
    var prevSum = labelSum(labels)
    var iter = 1 // the seed already performed one propagation round
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        // two chained rounds, one materializing job: the mid frame is
        // persist()ed so the double-round plan evaluates it once (both
        // of round 2's references read the cached blocks), and freed
        // as soon as the sum materializes the pair.
        val mid = propagate(labels).persist()
        val next = truncate(propagate(mid))
        val sm = labelSum(next) // materializes next before the old rounds are freed
        mid.unpersist()
        labels.unpersist() // checkpointed blocks: reclaimed by the ContextCleaner
        labels = next
        converged = sm.compareTo(prevSum) == 0
        prevSum = sm
        iter += 2
      }
    } finally sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents: min-label propagation did not converge in $maxIter rounds — " +
          s"graph has a component of diameter > $maxIter. Long-chain graphs resolve in " +
          "O(log n) iterations via ConnectedComponents.alternatingStar.")
    // Hand back a frame whose OWN persisted blocks are the result:
    // returning a projection of the internally-cached final round
    // would make the caller's unpersist() a silent no-op (unpersist
    // does not cascade to children), leaking the last round's blocks
    // for the life of the session.
    // NO trailing labels.unpersist(): `out` is a rename-only
    // projection of the final round, so their canonicalized plans are
    // sameResult — unpersisting `labels` here would evict the cache
    // entry `out` just built (exact-match uncache), silently breaking
    // this contract. The final round is a lazily-localCheckpointed
    // LogicalRDD, not a cached frame: its blocks belong to the RDD and
    // are reclaimed by the ContextCleaner once unreferenced.
    val out = labels.select(col("id"), col("lbl").as("component")).persist()
    out.count() // materialize the result cache
    out
  }

  /** Large-star / small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the O(log n)-round escape
    * hatch for graphs whose components have LARGE diameter, where
    * min-label propagation needs `diameter` rounds. Each iteration is
    * two rounds of the same keyed-join-plus-aggregate plan shape as
    * [[minLabel]]:
    *
    *  - large-star: every node u links each strictly-larger neighbor
    *    to the minimum of its closed neighborhood m = min(N(u) ∪ u) —
    *    edges (v, m) for v ∈ N(u), v > u.
    *  - small-star: every edge directed large→small; each node u links
    *    its smaller neighbors AND ITSELF to m = min(N⁻(u) ∪ u) —
    *    edges (v, m) and (u, m).
    *
    * Both steps preserve connectivity and only ever decrease the
    * partner of a node, so the edge set converges to disjoint stars
    * centered at component minima — doubling the "hop radius" per
    * alternation instead of extending it by one. Convergence test:
    * exact set equality of consecutive edge sets (symmetric-difference
    * emptiness in one aggregate job — a label-sum shortcut like
    * [[minLabel]]'s is NOT sound here, because the edge set can change
    * while preserving an aggregate).
    *
    * Use [[minLabel]] for near-dup dedup graphs (star/clique shaped,
    * diameter 2–4 — fewer rounds, no edge-set rewriting); use this
    * when components may be long chains (e.g. transitive similarity
    * over sliding shingle windows).
    *
    * @return (id, component), component = min id of the component; the
    *         returned Dataset is the persisted result, same contract
    *         as [[minLabel]] (including `checkpointDir` semantics).
    */
  def alternatingStar(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame =
    // eager local truncation: this operator's convergence test
    // materializes frames pairwise, so the lazy variant buys nothing
    withCheckpointDir(vertices, checkpointDir, localEager = true) { truncate =>
      alternatingStarImpl(vertices, edges, maxIter, truncate)
    }

  private def alternatingStarImpl(vertices: DataFrame, edges: DataFrame, maxIter: Int,
      truncate: DataFrame => DataFrame): DataFrame = {
    // canonical undirected pairs, self-loops dropped
    def canon(e: DataFrame): DataFrame = e
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    // exact set equality of two (distinct) canonical edge sets: any
    // pair present in exactly one of them breaks the fixpoint
    def sameEdges(a: DataFrame, b: DataFrame): Boolean =
      a.union(b).groupBy(col("lo"), col("hi")).count()
        .filter(col("count") === 1).limit(1).count() == 0
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val m = sym.groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("m"))
      canon(sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // every canonical pair is already large(hi) → small(lo)
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val linked = e.join(m, Seq("hi"))
        .select(col("lo").as("src"), col("m").as("dst"))
        .union(m.select(col("hi").as("src"), col("m").as("dst")))
      canon(linked)
    }
    var cur = truncate(canon(edges))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val ls = largeStar(cur).persist()
      val nextPlan = smallStar(ls)
      val next =
        if (iter % 2 == 1) truncate(nextPlan) else nextPlan.persist()
      converged = sameEdges(next, cur) // materializes next before cur is freed
      ls.unpersist()
      cur.unpersist()
      cur = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents: star alternation did not converge in $maxIter iterations")
    // stars: every non-center points at its center; isolated vertices
    // are their own component
    val out = vertices
      .join(cur.select(col("hi").as("id"), col("lo").as("cmp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cmp"), col("id")).as("component"))
      .persist()
    out.count()
    cur.unpersist()
    out
  }
}
