package graft

/** Scale guardrails: the plans we'd want at 100 TB — parquet pushdown
  * + pruned scans, broadcast joins for dims, no cartesian products
  * anywhere in the registry.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to parquet, scan pruned to used columns") {
    val p = plan(graft.olap.Olap.q1.run(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "scan should prune unused columns")
  }

  test("q3/q5: dimension joins broadcast") {
    assert(plan(graft.olap.Olap.q3.run(spark, sfDir)).contains("BroadcastHashJoin"))
    assert(plan(graft.olap.Olap.q5.run(spark, sfDir)).contains("BroadcastHashJoin"))
  }

  test("q3: top-k runs as TakeOrderedAndProject, not a global sort") {
    assert(plan(graft.olap.Olap.q3.run(spark, sfDir)).contains("TakeOrderedAndProject"))
  }

  test("q_bucketed_join: zero exchange below the join (bucket co-location)") {
    val j = graft.olap.Olap2.bucketedOrdersJoin(spark, sfDir)
    val p = plan(j)
    val joinIdx = p.linesIterator.indexWhere(l => l.contains("SortMergeJoin"))
    assert(joinIdx >= 0, p)
    // everything below the join (scans) must be exchange-free
    assert(!p.linesIterator.drop(joinIdx).exists(_.contains("Exchange")),
      s"bucketed join still shuffles:\n$p")
  }

  test("m4: per-series top-1 plans WindowGroupLimit partial pushdown below the shuffle") {
    val p = plan(graft.metrics.Metrics.latestPerSeries.run(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }

  test("s_ivf_adc: cell-routed equi-joins only — no nested-loop scan of the corpus") {
    for (q <- Seq(graft.sim.Sim.ivfAdc, graft.sim.Sim.ivfAdcResidual, graft.sim.Opq.opqAdc)) {
      val p = plan(q.run(spark, sfDir))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} must route probes to cells via an equi-join, not scan the corpus:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"${q.name}: expected broadcast hash joins:\n$p")
    }
  }

  test("near-dup pair fan-out runs the native generator on capped buckets") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // the lazy plan: the public entry checkpoints (its plan is an
    // opaque RDD scan), the invariants live on the plan underneath
    val p = plan(graft.dedup.Dedup.ngramJaccardPairsPlan(docs))
    assert(p.contains("Generate graft_ordered_pairs"),
      s"pair fan-out must be the native generator:\n$p")
    assert(!p.contains("flatten"),
      s"the materializing HOF pair chain must be gone:\n$p")
    // bucket arrays are built only AFTER the under-cap semi-join: the
    // collect_list aggregate's input must be a join output, never the
    // raw exploded entries (that ordering is what bounds every bucket
    // array by the cap at any duplication level)
    val lines = p.linesIterator.toVector
    val aggIdx = lines.indexWhere(l => l.contains("partial_collect_list"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(aggIdx >= 0 && joinIdx > aggIdx,
      s"bucket build must consume the df-filter join:\n$p")
  }

  test("no operator plans a cartesian product") {
    // includes the IVF family: since the map-side argmin rewrite their
    // centroids are literals, so no crossJoin remains anywhere.
    for (q <- SparkEntry.registry) {
      val p = plan(q.run(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian product")
    }
  }
}
