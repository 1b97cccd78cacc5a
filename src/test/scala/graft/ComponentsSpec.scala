package graft

import org.apache.spark.sql.functions._

/** Exact component labeling on hand-built graphs. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain + island + singleton-pair resolve to component minima") {
    // 1-2-3 chain, 7-8 pair, 5-6 pair
    val edges = Seq((2L, 1L), (2L, 3L), (7L, 8L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup.connectedComponents(edges)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("long path converges (diameter > a couple of rounds)") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val labels = graft.dedup.Dedup.connectedComponents(edges)
    assert(labels.select(countDistinct($"component")).head().getLong(0) === 1L)
    assert(labels.agg(min("component")).head().getLong(0) === 1L)
    assert(labels.count() === n.toLong)
  }
}
