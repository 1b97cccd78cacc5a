package graft

import org.apache.spark.sql.functions._

/** IVF search quality: measure recall@3 of the multi-probe (nprobe=2)
  * cell search against brute-force cosine top-3 on the same probes.
  */
class IvfRecallSpec extends SparkSpec {

  test("s_ivf_search recall@3 vs brute force is >= 0.9 at nprobe=2") {
    val ivf = graft.sim.Sim.ivfSearch.run(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = graft.sim.Sim.bruteTopk.run(spark, sfDir)
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(brute.nonEmpty)
    val recalls = brute.map { case (p, truth) =>
      val got = ivf.getOrElse(p, Set.empty)
      truth.intersect(got).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"nprobe=2 IVF recall@3 = $mean%.2f over ${recalls.size} probes")
    // 2 of 8 cells searched: boundary neighbors are what multi-probe
    // exists to recover — demand near-exact recall.
    assert(mean >= 0.9, f"recall $mean%.2f below multi-probe floor")
  }
}
