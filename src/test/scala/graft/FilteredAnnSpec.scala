package graft

/** Behavioral contract for s_filtered_ann (pre-filtered vector
  * search): every surfaced neighbor satisfies the probe's predicate,
  * ranks are well-formed, and pre-filtering ≠ post-filtering the
  * unfiltered top-k (the reason the filter must join the candidate
  * scan).
  */
class FilteredAnnSpec extends SparkSpec {

  private lazy val rows =
    graft.sim.Sim.filteredAnn.run(spark, sfDir).collect()

  test("every neighbor shares its probe's label") {
    val lab = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, n) = (r.getLong(0), r.getLong(1))
      assert(lab(p) === lab(n), s"probe $p (label ${lab(p)}) got neighbor $n (label ${lab(n)})")
    }
  }

  test("ranks contiguous from 1, cosine non-increasing per probe") {
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to sorted.length))
      val cs = sorted.map(_.getDouble(3)).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pre-filter differs from post-filtering the unfiltered top-3") {
    // if filtering after the unfiltered top-k were equivalent, every
    // filtered (probe, neighbor) would appear in the unfiltered top-3;
    // with mixed-label cells at least one probe must surface a
    // neighbor the unfiltered ranking crowded out
    val unfiltered = graft.sim.Sim.ivfSearch.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((filtered -- unfiltered).nonEmpty,
      "filtered results all present in unfiltered top-3 — post-filter would have sufficed")
  }
}
