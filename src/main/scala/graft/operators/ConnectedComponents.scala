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
  * @param vertices one column `id` (any numeric type)
  * @param edges    columns `src`, `dst` (directed input; symmetrized
  *                 internally, self-loops harmless)
  * @return (id, component) where component = min id of the component
  */
object ConnectedComponents {

  def minLabel(vertices: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    // Lineage discipline: each round's plan references the previous
    // round twice (the join and the neighbor aggregate), so without
    // TRUNCATION the logical plan doubles per round — exponential
    // driver-side planning cost by round ~15 even though data is
    // cached. Every 5th round localCheckpoints (replacing the plan
    // with the materialized partitions — a cluster deployment with a
    // checkpoint dir would use reliable checkpoint() for fault
    // tolerance too); the rounds in between persist() so the previous
    // round's blocks can be freed PROMPTLY with unpersist instead of
    // waiting on the ContextCleaner. Plan size is bounded at 2^5
    // nodes per window.
    var labels = vertices.select(col("id"), col("id").as("lbl")).localCheckpoint()
    // sum(...) is null on an empty frame: an empty graph is a valid
    // input (zero components), not an NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
          .groupBy(col("src")).agg(min(col("nlbl")).as("nbr_min"))
        val nextPlan = labels
          .join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id"),
            least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
        val next =
          if ((iter + 1) % 5 == 0) nextPlan.localCheckpoint() else nextPlan.persist()
        val sm = labelSum(next) // materializes next before the old round is freed
        labels.unpersist() // no-op for checkpointed rounds (cleaner reclaims those)
        labels = next
        converged = sm.compareTo(prevSum) == 0
        prevSum = sm
        iter += 1
      }
    } finally sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents: min-label propagation did not converge in $maxIter rounds — " +
          s"graph has a component of diameter > $maxIter")
    labels.select(col("id"), col("lbl").as("component"))
  }
}
