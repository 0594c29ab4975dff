package graft.operators

import graft.SparkSpec

/** Round-10 plan-hygiene guard: with the broadcast threshold DISABLED,
  * any BroadcastExchange left in an executed plan can only come from an
  * explicit hint — so pinning the count per query catches a
  * reintroduced corpus-growing broadcast (the subquery_in /
  * text_surprisal class of scale-killer: NOT-IN null-aware anti joins,
  * vocabulary/user/degree-table hints) the moment it lands, instead of
  * at the next ×100 rehearsal. The pinned budget for each query is its
  * number of DELIBERATE bounded hints (1-row aggregate frames,
  * constant nation/region dims); queries fixed this round pin at 0.
  */
class BroadcastHygieneSpec extends SparkSpec {

  // query -> max BroadcastExchange nodes allowed in the executed plan
  // (each allowance is a specific bounded hint, named here):
  private val budgets: Seq[(String, Int, String)] = Seq(
    ("subquery_in", 0, "NOT EXISTS anti join — nothing broadcastable"),
    ("text_top_terms", 0, "term-df join unhinted"),
    ("text_bigram_lm", 0, "bigram/unigram probes unhinted"),
    ("phrase_mining", 0, "unigram probes unhinted"),
    ("cohort_retention", 0, "per-user cohort frame unhinted"),
    ("join_nonequi", 0, "SF-scaled part side unhinted"),
    ("window_lag", 0, "SF-scaled part side unhinted"),
    ("q3_shipping_priority", 0, "SF-scaled customer side unhinted"),
    ("q21_waiting_suppliers", 1,
      "25-row nation dim; supplier, orders, semi and anti sides unhinted"),
    ("dq_checks", 0, "FK probes are shuffle-hash, never broadcast"),
    ("text_surprisal", 1, "the 1-row corpus-total frame"),
    ("assoc_rules", 1, "the 1-row basket-census frame"),
    ("langid_nb", 3, "1-row vocab + |langs|-row prior and total frames"),
    ("quantile_exact", 0, "target-bin frame joined unhinted (AQE-sized)"),
    ("stream_quantile", 0, "pure aggregation + windows — no join at all"),
    ("dedup_containment", 1, "the 1-row corpus-min shingle-count frame"),
    ("dedup_embcos", 1,
      "the 1-row id-stride frame (augmentation); candidates and scorer joins unhinted"),
    ("text_ppl_filter", 1,
      "the 1-row model-vocab frame; c2/c1 probes unhinted LEFT joins"),
    ("profile_columns", 1,
      "the 1-row exact-distinct frame (exact regime below the size gate)"),
    ("profile_columns_approx", 1,
      "the |cols|-row exact-NDV harness frame; the approx profile itself " +
        "is one agg pass with no join"))

  test("no broadcast beyond the pinned bounded-hint budget (threshold -1)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      for ((name, budget, why) <- budgets) {
        val df = graft.SparkEntry.queries(name)(spark, sf0001)
        // execute THIS queryExecution so the inspected adaptive plan is
        // the final, executed one (count() would build its own)
        df.collect()
        // AdaptiveSparkPlanExec prints "== Final Plan ==" followed by
        // "== Initial Plan ==" — count only the final, executed section
        val full = df.queryExecution.executedPlan.toString
        val plan = full.split("== Initial Plan ==")(0)
        val n = "BroadcastExchange".r.findAllIn(plan).length
        assert(n <= budget,
          s"$name: $n BroadcastExchange nodes with broadcasts disabled " +
            s"(budget $budget — $why); a corpus-growing broadcast hint " +
            s"or a broadcast-only join shape crept back in:\n" +
            plan.take(3000))
      }
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
