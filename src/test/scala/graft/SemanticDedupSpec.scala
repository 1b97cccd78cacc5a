package graft

import org.apache.spark.sql.functions._

/** d_semantic_dedup (SemDeDup-style within-cluster pruning): verify the
  * operator's drop set against a from-scratch recompute of the rule —
  * a vector is dropped iff an earlier (smaller-id) vector in its IVF
  * cell has round(cos, 4) ≥ τ, and kept_by is the SMALLEST such id.
  * Soundness, completeness, and representative-minimality are each
  * asserted separately so a failure names the broken property.
  */
class SemanticDedupSpec extends SparkSpec {

  private val Tau = 0.45

  test("d_semantic_dedup drop set == brute-force within-cell rule (sound, complete, minimal)") {
    val out = graft.dedup.Dedup.semanticDedup.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    // ground truth from the same memoized index the operator uses
    val rows = graft.sim.Sim.ivfIndex(spark, sfDir, k = 8, iters = 3).assigned
      .select(col("vec_id"), col("cid"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

    val expected = rows.flatMap { case (id, cid, v) =>
      val partners = rows.filter { case (pid, pcid, pv) =>
        pid < id && pcid == cid && r4(cos(pv, v)) >= Tau
      }
      partners.headOption.map { case (pid, _, pv) => id -> ((cid, pid, r4(cos(pv, v)))) }
    }.toMap

    assert(expected.nonEmpty, "fixture produced zero semantic dups — threshold too high for sfDir")
    // completeness: every rule-dropped vector is in the operator output
    val missing = expected.keySet.diff(out.keySet)
    assert(missing.isEmpty, s"rule drops absent from operator output: $missing")
    // soundness: no operator row lacks a rule justification
    val extra = out.keySet.diff(expected.keySet)
    assert(extra.isEmpty, s"operator dropped rows the rule keeps: $extra")
    // minimality + cell + sim: the representative is the smallest
    // qualifying id and the reported cosine is the one to IT
    out.foreach { case (id, got) =>
      assert(got === expected(id), s"row $id: got $got expected ${expected(id)}")
    }
    info(s"${out.size} semantic dups verified against the brute-force rule")
  }

  // Cell-count contract: the oracle unrolls Lloyd at k=8, so the
  // adaptive count must resolve to exactly 8 at every gate scale and
  // grow ~sqrt(n) beyond — a fixed k leaves within-cell pair cost
  // quadratic (r9 100x sweep measured exponent 1.48 before this).
  test("semDedupCells: pinned at 8 for gate scales, ~sqrt(n) growth beyond") {
    import graft.sim.Sim.semDedupCells
    // gate corpora: sf0.001=20, sf0.01=200, sf0.1=2000 embeddings
    for (n <- Seq(20L, 200L, 2000L, 3200L)) assert(semDedupCells(n) === 8, s"n=$n")
    assert(semDedupCells(20000L) === 20)   // 10x corpus
    assert(semDedupCells(200000L) === 63)  // 100x corpus
    // growth keeps expected cell population ~sqrt(50n): pair mass n^1.5
    assert(semDedupCells(20000000L) === 632)
  }

  test("oracle-gated run fails loudly if the cell count would diverge from the SQL replay") {
    import graft.sim.Sim.{guardOracleCells, semDedupCells}
    sys.props("graft.assertFixedCap") = "true"
    try {
      guardOracleCells(8, 2000L) // gate scale: must pass
      val k = semDedupCells(50000L)
      assert(k !== 8)
      val e = intercept[IllegalStateException](guardOracleCells(k, 50000L))
      assert(e.getMessage.contains("oracle-gated"))
    } finally sys.props.remove("graft.assertFixedCap")
    guardOracleCells(32, 50000L) // un-gated: dynamic k is allowed
  }
}
