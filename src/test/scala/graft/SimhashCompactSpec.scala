package graft

import org.apache.spark.sql.DataFrame

/** d_simhash_compact ≡ d_simhash: the exact-prepass composition must
  * produce the identical pair set — including on inputs engineered to
  * break a wrong collapse key (case variants share d_exact's
  * normText class but tokenize differently).
  */
class SimhashCompactSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("equivalent to the direct simhash pass on sf0.001 documents") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val direct = pairs(graft.dedup.Dedup.simhashPairs(docs))
    val compact = pairs(graft.dedup.Dedup.simhashCompactPairs(docs))
    assert(compact === direct)
    assert(direct.nonEmpty) // the corpus has near-dups; a vacuous pass would hide a bug
  }

  test("replica-heavy corpus: intra-, cross-class, and case-variant pairs all match") {
    // Class A: 3 identical docs; class B: 2 identical docs one token
    // off A (cross-class near-dup candidates); case variant of A
    // (same normText class, different token sequence — must NOT be
    // collapsed into A); one far-away doc.
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the  quick brown fox jumps over the lazy dog  "), // ws-variant: same class
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "the quick brown fox jumps over the lazy cat"),
      (5L, "The Quick Brown Fox Jumps Over The Lazy Dog"),
      (6L, "completely different words about weather patterns today"),
    ).toDF("doc_id", "text")
    val direct = pairs(graft.dedup.Dedup.simhashPairs(docs))
    val compact = pairs(graft.dedup.Dedup.simhashCompactPairs(docs))
    assert(compact === direct)
    // the three ws-identical docs must appear as hamming-0 pairs
    assert(Set((0L, 1L, 0), (0L, 2L, 0), (1L, 2L, 0)).subsetOf(compact))
  }
}
