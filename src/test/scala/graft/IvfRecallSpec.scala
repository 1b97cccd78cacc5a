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

  test("s_ivf_adc recall@3 vs brute force is production-grade; re-ranked sims are exact") {
    val adc = graft.sim.Sim.ivfAdc.run(spark, sfDir)
    val got = adc.select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val bruteRows = graft.sim.Sim.bruteTopk.run(spark, sfDir).collect()
    val brute = bruteRows.filter(_.getAs[Int]("rank") <= 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(brute.nonEmpty)
    val recalls = brute.map { case (p, truth) =>
      truth.intersect(got.getOrElse(p, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-ADC recall@3 vs brute cosine = $mean%.2f")
    // 8-bit subspace codebooks (PqK = 256) + a 50-candidate shortlist:
    // the ADC ranking must carry the true neighbors into the exact
    // re-rank — the residual IVF-routing loss (nprobe=2 of 8 cells,
    // ceiling ~0.93 per the s_ivf_search test) is all that may remain.
    assert(mean >= 0.8, f"IVF-ADC recall $mean%.2f below production floor 0.8")
    // the re-rank surface is EXACT cosine: every reported (probe,
    // neighbor, cos_sim) must equal the brute-force value for that pair
    val bruteSim = bruteRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cos_sim")).toMap
    for (r <- adc.collect()) {
      val key = (r.getLong(0), r.getLong(1))
      // brute only reports its own top-5; compare where both surfaced
      bruteSim.get(key).foreach(exp =>
        assert(r.getAs[Double]("cos_sim") === exp, s"inexact re-rank sim at $key"))
    }
  }

  test("residual ADC: same 32-bit memory budget, recall vs plain ADC recorded") {
    def recallOf(df: org.apache.spark.sql.DataFrame, brute: Map[Long, Set[Long]]): Double = {
      val got = df.select(col("probe_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = brute.map { case (p, t) =>
        t.intersect(got.getOrElse(p, Set.empty)).size.toDouble / t.size
      }
      rs.sum / rs.size
    }
    val brute = graft.sim.Sim.bruteTopk.run(spark, sfDir)
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val plain = recallOf(graft.sim.Sim.ivfAdc.run(spark, sfDir), brute)
    val res = recallOf(graft.sim.Sim.ivfAdcResidual.run(spark, sfDir), brute)
    // the recall-vs-memory point: both variants spend 32 bits/vector;
    // residual codebooks see smaller, better-centered inputs, so the
    // residual form must clear the higher floor.
    info(f"recall@3 vs brute: plain ADC $plain%.2f, residual ADC $res%.2f")
    assert(res >= 0.85, f"residual ADC recall $res%.2f below production floor 0.85")
    assert(plain >= 0.8, f"plain ADC recall $plain%.2f below production floor 0.8")
  }

  test("OPQ rotation: recall-vs-memory curve vs un-rotated residual ADC at each code budget") {
    def recallOf(df: org.apache.spark.sql.DataFrame, brute: Map[Long, Set[Long]]): Double = {
      val got = df.select(col("probe_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = brute.map { case (p, t) =>
        t.intersect(got.getOrElse(p, Set.empty)).size.toDouble / t.size
      }
      rs.sum / rs.size
    }
    val brute = graft.sim.Sim.bruteTopk.run(spark, sfDir)
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // the curve: at each per-subspace budget k (16 = 4-bit codes, the
    // memory-starved regime where rotation matters most; 256 = the
    // production 8-bit budget), the SAME routed pipeline with and
    // without the learned rotation
    val curve = Seq(16, 256).map { k =>
      val plain = recallOf(graft.sim.Opq.searchOpq(spark, sfDir, k, rotate = false), brute)
      val opq = recallOf(graft.sim.Opq.searchOpq(spark, sfDir, k, rotate = true), brute)
      info(f"k=$k%3d (${graft.sim.Sim.PqM * (32 - Integer.numberOfLeadingZeros(k - 1))} bits/vec): residual $plain%.3f → OPQ $opq%.3f")
      (k, plain, opq)
    }
    // OPQ must never lose to the un-rotated baseline at any budget,
    // and must strictly win somewhere on the curve — the rotation has
    // to BUY something, not just be orthogonally harmless.
    curve.foreach { case (k, plain, opq) =>
      assert(opq >= plain, f"OPQ recall $opq%.3f below un-rotated $plain%.3f at k=$k")
    }
    assert(curve.exists { case (_, plain, opq) => opq > plain },
      "OPQ strictly improved recall nowhere on the curve")
  }
}
