package graft

import org.apache.spark.sql.functions._

/** Behavioral contract for t_ngram_lm (LM-perplexity filtering):
  * all-unseen documents land exactly on the uniform 1/V floor,
  * target-like documents score lower NLL than off-distribution ones,
  * and the registered tertile cut is well-formed.
  */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  test("all-unseen doc scores exactly the uniform floor ln(V)") {
    // Target corpus: docs 1..2, vocabulary {a,b,c} ⇒ V = 3 + 1 = 4.
    // Probe doc 10 has only unseen tokens: every bigram falls back to
    // the smoothed floor (0+1)/(0+V) ⇒ avg_nll = round(ln 4, ...).
    val docs = Seq(
      (1L, "a b c a b"),
      (2L, "b c a"),
      (10L, "x y z x")).toDF("doc_id", "text")
    val (pair, ctx, vocab) = graft.text.Text.lmModel(docs, isTarget = col("doc_id") <= 2)
    val nll = graft.text.Text.lmScore(docs, pair, ctx, vocab)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // lp = round(ln(1/4), 6) per bigram; avg_nll = round(-lp, 4)
    val expected = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(nll(10L) === expected.toDouble,
      s"unseen doc nll ${nll(10L)} != uniform floor $expected")
  }

  test("in-distribution docs score lower NLL than off-distribution docs") {
    val target = (1L to 5L).map(i => (i, "the cat sat on the mat the cat sat"))
    val probes = Seq(
      (20L, "the cat sat on the mat"), // model bigrams throughout
      (21L, "zebra quartz nimbus vortex ember")) // all unseen
    val docs = (target ++ probes).toDF("doc_id", "text")
    val (pair, ctx, vocab) = graft.text.Text.lmModel(docs, isTarget = col("doc_id") <= 5)
    val nll = graft.text.Text.lmScore(docs, pair, ctx, vocab)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(20L) < nll(21L),
      s"in-distribution ${nll(20L)} not below off-distribution ${nll(21L)}")
  }

  test("registered query: tertiles balanced, NLL ordered head <= middle <= tail") {
    val rows = graft.text.Text.ngramLm.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getString(3))
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // ntile(3) balance: bucket sizes differ by at most 1
    val sizes = byBucket.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced tertiles: $byBucket")
    def maxNll(b: String) = byBucket(b).map(_.getDouble(2)).max
    def minNll(b: String) = byBucket(b).map(_.getDouble(2)).min
    assert(maxNll("head") <= minNll("middle"))
    assert(maxNll("middle") <= minNll("tail"))
  }
}
