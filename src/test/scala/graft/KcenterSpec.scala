package graft

import org.apache.spark.sql.functions._

/** Behavioral contract for s_kcenter_coreset (greedy farthest-point
  * selection): on a hand-built geometry the selection order is the
  * known one, selection distances are the non-increasing coverage
  * radii, and the registered query is well-formed and deterministic.
  */
class KcenterSpec extends SparkSpec {

  import spark.implicits._

  private def frame(pts: Seq[(Long, Seq[Double])]) =
    pts.toDF("vec_id", "v")

  test("hand-built geometry selects in farthest-point order") {
    // 1-D embedding: 0 at x=0 (seed), 1 at x=10, 2 at x=4, 3 at x=6.
    // Greedy: seed 0 → farthest is 1 (d2=100); then 2 and 3 tie at
    // dmin=16 and the smaller vec_id (2) wins; 3 last at dmin=4.
    val pts = Seq(
      (0L, Seq(0.0)), (1L, Seq(10.0)), (2L, Seq(4.0)), (3L, Seq(6.0)))
    val sel = graft.sim.Kcenter.greedySelect(frame(pts), 4)
    assert(sel.map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(sel.map(_._3) === Seq(0.0, 100.0, 16.0, 4.0))
  }

  test("selection distances are non-increasing coverage radii") {
    val sel = graft.sim.Kcenter.kcenterCoreset.run(spark, sfDir).collect()
    assert(sel.length === graft.sim.Kcenter.KcK)
    assert(sel.map(_.getInt(0)).toSeq === (1 to graft.sim.Kcenter.KcK))
    val ds = sel.map(_.getDouble(2)).drop(1) // seed row records 0
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"selection d2 not non-increasing: ${ds.toSeq}")
    // all selected ids distinct
    assert(sel.map(_.getLong(1)).distinct.length === sel.length)
  }

  test("selection is deterministic across recomputation") {
    val docs = graft.sim.Kcenter.kcenterCoreset.run(spark, sfDir).collect().toSeq
    val again = graft.sim.Kcenter.kcenterCoreset.run(spark, sfDir).collect().toSeq
    assert(docs === again)
  }
}
