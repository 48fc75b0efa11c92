package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Physical-plan pins for the round-12 wave 54-61 operators: the
  * scale properties their scaladocs claim (broadcasts, single keyed
  * exchanges, range-partitioned NTILE, one-column scans, no
  * cartesian products) must be visible in the executed plan.
  */
class Wave61PlanSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("wave 54-61 group aggregates never plan a CartesianProduct") {
    Seq("anova_oneway", "jarque_bera", "mutual_info", "js_divergence",
      "k_anonymity", "graph_modularity", "cohens_kappa", "srm_check",
      "psi_stability", "cuped_adjust", "mde_power", "markov_entropy_rate",
      "theta_forecast", "pacf_durbin", "ljung_box", "page_hinkley",
      "hour_profile", "seasonality_strength", "code_detect",
      "tokenizer_compression", "lift_table", "map_eval",
      "join_skew_report", "spearman_rho").foreach { q =>
      withClue(s"$q: ") {
        assert(!plan(q).contains("CartesianProduct"),
          "cartesian product in the plan")
      }
    }
  }

  test("jarque_bera: the per-type pseudo-mean joins back as a broadcast") {
    val p = plan("jarque_bera")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("spearman_rho: the 50-value x-rank side broadcasts; y side stays keyed") {
    val p = plan("spearman_rho")
    assert(p.contains("BroadcastHashJoin"), "x-rank join should broadcast")
  }

  test("map_eval: all three window functions share ONE user-keyed exchange") {
    // AQE's toString appends the "== Initial Plan ==" section, which
    // would double-count the exchange — measure the final plan only
    val p = finalPlan("map_eval").split("== Initial Plan ==").head
    val shuffles = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(shuffles <= 1, s"expected a single user_id exchange, saw $shuffles:\n${p.take(3000)}")
  }

  test("lift_table and psi_stability tile via range partitioning, not a global sort") {
    Seq("lift_table", "psi_stability").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        assert(p.toLowerCase.contains("rangepartitioning"),
          "DistributedNtile's range exchange missing")
      }
    }
  }

  test("join_skew_report: each audited key scans exactly its one column") {
    val p = plan("join_skew_report")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      "l_orderkey leg reads more than one column")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"),
      "o_custkey leg reads more than one column")
  }

  test("code_detect: the text non-null filter reaches the parquet scan") {
    val p = plan("code_detect")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"), p.take(2000))
  }

  test("hour_profile: per-type totals broadcast back onto the bounded grid") {
    val p = plan("hour_profile")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("norm_text expression participates in codegen for lang_id consumers") {
    val p = finalPlan("lang_id")
    assert(p.toLowerCase.contains("norm_text") ||
      p.toLowerCase.contains("normtext"), p.take(2000))
    assert(!p.contains("regexp_replace"),
      "the fused path should not fall back to regex normalization")
  }
}
