package graft

import org.apache.spark.sql.functions._

/** d_canonical cross-checked against its two inputs: every dedup
  * component appears exactly once, and the kept doc is a member whose
  * quality is the component maximum (min doc_id among maxima).
  */
class CanonicalSpec extends SparkSpec {

  test("kept doc is the quality-argmax member of each component") {
    val comps = graft.dedup.Dedup.components.run(spark, sfDir)
      .select("doc_id", "component").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    val qual = graft.text.Text.qualityScore.run(spark, sfDir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val picked = graft.dedup.Dedup.canonicalPick.run(spark, sfDir).collect()
    assert(picked.map(_.getLong(0)).toSet === comps.keySet, "one row per component")
    picked.foreach { r =>
      val (comp, kept, kq, n) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val members = comps(comp)
      assert(members.contains(kept), s"kept $kept not in component $comp")
      assert(n === members.size.toLong)
      val best = members.map(qual).max
      assert(kq === best, s"component $comp kept quality $kq != max $best")
      assert(kept === members.filter(m => qual(m) == best).min, "tie-break must be min doc_id")
    }
  }
}
