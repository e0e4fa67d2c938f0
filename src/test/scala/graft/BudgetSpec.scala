package graft

/** In-suite half of the per-key bench-budget guard (VERDICT r8 item 1):
  * every `sbt test` re-times the 20 slowest BENCH_r08 keys at the suite
  * config (shared local[2] session, sf0.01) against their recorded
  * bands × 1.5, normalized by the job canary measured in the same
  * session — so a round-7-style silent drift fails the build on the
  * commit that introduces it, while host weather merely widens the
  * budget. The bench-config twin (local[32], sf0.1) is enforced at
  * round close by `graft.BudgetCheck`.
  *
  * Red demo: GRAFT_BUDGET_SLOW_KEY=q_graph_pagerank sbt "testOnly
  * graft.BudgetSpec" sleeps 2× that key's band inside its timed section
  * and this spec fails (exercised at round-9 close, see BASELINE.md). */
class BudgetSpec extends SparkSpec {
  test("guarded keys stay within recorded band x1.5, canary-normalized") {
    val res = Budget.check(spark, "/root/testdata/sf0.01", Budget.suiteTier)
    res.foreach(r => info(r.line))
    val over = res.filterNot(_.ok)
    assert(over.isEmpty,
      s"\nbudget breach:\n${over.map(_.line).mkString("\n")}")
  }
}
