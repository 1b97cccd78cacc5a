package graft

import org.apache.spark.sql.functions._

/** AnnProbe's brute-force recall baseline was rewritten in r15 from a
  * row_number window (which sort-exchanges probes×corpus candidate
  * rows — ~100 GB of spill at 100M vectors) to a bounded
  * per-partition top-3 merge. The selected (probe, neighbor) set must
  * be IDENTICAL to the window form — it is the denominator of every
  * recall@3 number the ANN scale claims rest on.
  */
class AnnBruteTopKSpec extends SparkSpec {

  test("bounded top-3 merge selects exactly the window form's rows") {
    val ev = graft.sim.Sim.vecs(spark, sfDir).select(col("vec_id"), col("v"))
    val probesR = ev.filter(col("vec_id") < 12)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    // the pre-r15 window form, verbatim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cs").desc, col("neighbor_id"))
    val windowed = broadcast(probesR)
      .join(ev.select(col("vec_id").as("neighbor_id"), col("v")),
        col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.gfunctions.cosine(col("pv"), col("v")).as("cs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bounded = graft.sim.AnnProbe.bruteTop3(probesR, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded === windowed)
    assert(bounded.size === 12 * 3)
    // ties: a probe with duplicate-cosine neighbors must break ties by
    // neighbor_id ascending in both forms — force one by duplicating a
    // vector under new ids
    import spark.implicits._
    val base = ev.limit(50)
    val dup = base.filter(col("vec_id") === 7)
      .select(lit(9001L).as("vec_id"), col("v"))
      .unionByName(base.filter(col("vec_id") === 7)
        .select(lit(9002L).as("vec_id"), col("v")))
    val ev2 = base.unionByName(dup)
    val p2 = ev2.filter(col("vec_id") === 7)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val got = graft.sim.AnnProbe.bruteTop3(p2, ev2)
      .collect().map(_.getLong(1)).toSet
    // both duplicates have cosine 1.0 with the probe; the third slot
    // goes to the best non-duplicate — and 9001 < 9002 both make it
    assert(got.contains(9001L) && got.contains(9002L))
    assert(got.size === 3)
  }
}
