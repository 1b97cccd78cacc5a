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
}
