package graft

import org.apache.spark.sql.functions._

/** The percentile sketch lands near the exact quantiles. */
class ApproxPercentileSpec extends SparkSpec {

  test("q_approx_percentiles within 5% of exact per segment") {
    val approx = graft.olap.Olap2.approxPercentiles.run(spark, sfDir)
    val exact = graft.sources.Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(percentile(col("c_acctbal"), lit(0.5)).as("exact_med"),
        percentile(col("c_acctbal"), lit(0.9)).as("exact_p90"))
    val rows = approx.join(exact, "c_mktsegment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val span = math.abs(r.getAs[Double]("exact_p90")) + 1.0
      assert(math.abs(r.getAs[Double]("approx_med") - r.getAs[Double]("exact_med")) / span < 0.05)
      assert(math.abs(r.getAs[Double]("approx_p90") - r.getAs[Double]("exact_p90")) / span < 0.05)
    }
  }

  // Regression pin: the sketch's inputs are deterministic, so its
  // outputs are too — a silent sketch-implementation change inside
  // the error envelope would pass the bound above but move these.
  test("q_approx_percentiles matches committed goldens at sf0.001") {
    val got = graft.olap.Olap2.approxPercentiles.run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val want = Seq(
      ("AUTOMOBILE", 4013.54, 8620.17),
      ("BUILDING", 3191.24, 7566.25),
      ("FURNITURE", 3828.03, 8857.76),
      ("HOUSEHOLD", 5392.28, 9544.14),
      ("MACHINERY", 4569.63, 8928.62))
    assert(got === want, s"sketch output moved: $got")
  }
}
