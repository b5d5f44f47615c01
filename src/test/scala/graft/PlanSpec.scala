package graft

/** Physical-plan audits — the 100 TB design assertions. Each checks a
  * property of the compiled plan, not the result: filters reach the
  * parquet scan, projections prune columns, dimension joins broadcast,
  * aggregations don't over-shuffle, hot paths stay in whole-stage
  * codegen.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf001)
      .queryExecution.executedPlan.toString

  test("p1 filter is pushed down to the parquet scan") {
    val p = plan("p1_lookup_filter")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(p_brand,Brand#13)"),
      s"brand filter not pushed:\n$p")
  }

  test("p10 projection prunes the scan schema") {
    val p = plan("p10_projection")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("s_acctbal"), "unused column read from parquet")
    assert(!p.contains("s_nationkey"), "unused column read from parquet")
  }

  test("q3/q5/j3 dimension joins broadcast") {
    for (q <- Seq("q3_top_revenue_orders", "q5_region_revenue",
        "j3_bridge_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q has no broadcast join:\n${p.take(2000)}")
    }
  }

  test("q1 aggregation is a single shuffle with partial aggregation") {
    val p = plan("q1_pricing_summary")
    // partial (map-side) + final aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "no partial aggregation")
    // exactly one exchange for the groupBy plus one for the final sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n${p.take(2000)}")
  }

  test("q1 stays inside whole-stage codegen") {
    // AQE prints codegen stages only in the final plan → execute first
    val df = Registry.byName("q1_pricing_summary").run(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // compact plan marks codegen stages as "*(n) Operator"
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r
      .findFirstIn(p).isDefined, p.take(1500))
  }

  test("j12 anti-join does not broadcast the big side") {
    val p = plan("j12_anti_join")
    assert(p.contains("LeftAnti"), s"anti join missing:\n${p.take(1500)}")
  }

  test("j4 semi-join broadcasts the query-key side") {
    val p = plan("j4_exact_hash_semijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi:\n${p.take(1500)}")
  }

  test("near-dup band joins are equi-joins, never cartesian products") {
    for (q <- Seq("j5_simhash_banded_match", "d_minhash_lsh",
        "d_embed_neardup", "s_cosine_ann_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cartesian product:\n${p.take(1500)}")
    }
  }

  test("s_cosine_topk broadcasts the query vectors") {
    val p = plan("s_cosine_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n${p.take(1500)}")
  }
}
