package graft

/** Behavioral contract for d_dup_profile: on a hand-built corpus the
  * exact-group and shingle-df histograms (and their quadratic pair
  * masses) are the known ones.
  */
class DupProfileSpec extends SparkSpec {

  import spark.implicits._

  test("hand-built corpus: known buckets and pair masses") {
    // three exact copies of 'a b c d' (group size 3 → bucket 2,
    // pair mass 3) + one unique 'x y z w' (bucket 1, mass 0).
    // Shingles: {a b c, b c d} each df 3 (bucket 2, mass 3 each);
    // {x y z, y z w} each df 1.
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b c d"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.dupProfileOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      ("exact_group", 1L, 1L, 1L, 0L),
      ("exact_group", 2L, 1L, 3L, 3L),
      ("shingle_df", 1L, 2L, 2L, 0L),
      ("shingle_df", 2L, 2L, 6L, 6L)))
  }

  test("pair mass equals what the pair-enumerating pass would generate") {
    // 5 identical docs: exact group of 5 → C(5,2) = 10 pairs;
    // both shingles have df 5 → 10 pairs each.
    val docs = (0L to 4L).map(i => (i, "p q r s")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.dupProfileOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(4))).toSeq
    assert(got === Seq(("exact_group", 10L), ("shingle_df", 20L)))
  }
}
