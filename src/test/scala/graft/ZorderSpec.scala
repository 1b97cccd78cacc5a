package graft

import org.apache.spark.sql.functions._

/** Quantifies what z-order layout buys: with 256 z-buckets over
  * (l_partkey, l_suppkey), the mean per-bucket min/max span must be a
  * small fraction of the global span on BOTH dims simultaneously —
  * whereas bucketing by one key's ranges leaves the other dim's spans
  * near-global (no pruning). This is the file-skipping property a
  * 100 TB layout decision rests on.
  */
class ZorderSpec extends SparkSpec {

  private def meanSpans(rows: Array[org.apache.spark.sql.Row],
                        pSpan: Double, sSpan: Double): (Double, Double) = {
    val p = rows.map(r => (r.getLong(2) - r.getLong(1)).toDouble / pSpan)
    val s = rows.map(r => (r.getLong(4) - r.getLong(3)).toDouble / sSpan)
    (p.sum / p.length, s.sum / s.length)
  }

  test("z-buckets are small rectangles on both dims; single-key buckets are not") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val g = li.agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val pSpan = (g.getLong(1) - g.getLong(0)).toDouble
    val sSpan = (g.getLong(3) - g.getLong(2)).toDouble

    val zRows = graft.olap.Olap2.zorderLayout.run(spark, sfDir)
      .select("bucket", "pmin", "pmax", "smin", "smax").collect()
    val (zp, zs) = meanSpans(zRows, pSpan, sSpan)

    // baseline: 256 equal partkey ranges (a partkey-sorted layout)
    val base = li
      .groupBy(floor(((col("l_partkey") - g.getLong(0)) * 255).cast("double") / pSpan)
        .as("bucket"))
      .agg(count(lit(1)).as("n"), min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .select("bucket", "pmin", "pmax", "smin", "smax").collect()
    val (bp, bs) = meanSpans(base, pSpan, sSpan)

    info(f"mean normalized span  z-order: partkey $zp%.3f suppkey $zs%.3f" +
      f"  |  partkey-ranges: partkey $bp%.3f suppkey $bs%.3f")
    // z-order: both dims prune (each bucket covers ≲ 1/16 of each dim
    // for a 256-bucket 2-dim curve, plus sampling noise at toy scale)
    assert(zp < 0.15, f"z-order partkey span $zp%.3f not small")
    assert(zs < 0.15, f"z-order suppkey span $zs%.3f not small")
    // single-key layout: its own key prunes, the other dim does not
    assert(bp < 0.05)
    assert(bs > 0.5, f"baseline suppkey span $bs%.3f unexpectedly small — bad testbed")
  }

  test("bucket stats partition the table: counts sum to row count, ranges within global") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
    val rows = graft.olap.Olap2.zorderLayout.run(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === li.count())
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3) && r.getLong(4) <= r.getLong(5)))
  }
}
