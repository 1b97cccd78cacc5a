package graft

import org.apache.spark.sql.functions._

/** BPE merge TRAINING (t_bpe_merges): the per-round argmax-and-rewrite
  * must reproduce the classic algorithm on a corpus small enough to
  * fold by hand — including the greedy non-overlapping merge of
  * repeated symbols and the deterministic tie-break.
  */
class BpeMergeSpec extends SparkSpec {

  private def trainOn(texts: Seq[String], rounds: Int) = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    graft.text.Text.bpeTrain(spark, docs, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  test("hand-checkable corpus: freq weighting, greedy overlap fold, early exhaustion") {
    // pieces: aaaa (freq 2), ab (freq 1)
    // round 1: (a,a) appears 3x per 'aaaa' => 6; (a,b) => 1 -> merge (a,a)
    //          greedy fold: aaaa -> [aa, aa]  (NOT [aa, a, a])
    // round 2: (aa,aa) => 2 beats (a,b) => 1 -> merge (aa,aa)
    // round 3: only (a,b) => 1 remains
    // round 4+: no pairs left -> training exhausts at 3 merges
    val got = trainOn(Seq("aaaa aaaa ab"), rounds = 5)
    assert(got === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L),
      (3, "a", "b", "ab", 1L)))
  }

  test("count ties break lexicographically on (left, right)") {
    // (a,b) and (c,d) both count 1 -> (a,b) merges first
    val got = trainOn(Seq("ab cd"), rounds = 2)
    assert(got.map(m => (m._1, m._2, m._3)) === Seq((1, "a", "b"), (2, "c", "d")))
  }

  test("encode: hand-checkable token counts after merges") {
    import spark.implicits._
    // corpus: 'aaaa aaaa ab' — after the 3 learned merges, vocab is
    // aaaa → [aaaa] (1 symbol), ab → [ab] (1 symbol).
    // doc 0 = 'aaaa aaaa ab': 3 pieces, 3 tokens.
    // doc 1 = 'aaaa b': 'aaaa' → 1 token; 'b' alone is its own piece
    //   — but 'b' never appeared as a standalone piece in TRAINING,
    //   so encode with the train corpus's own docs only (the
    //   registered op encodes the corpus it trained on).
    val docs = Seq((0L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val (_, vocabF) = graft.text.Text.bpeTrainState(spark, docs, 5)
    val out = graft.text.Text.bpeEncodeDocs(docs, vocabF).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 3L) // n_pieces
    assert(out(0).getLong(2) === 3L) // n_tokens: aaaa, aaaa, ab fully merged
    assert(out(0).getDouble(3) === 1.0)
  }

  test("encode: zero merges means one token per character") {
    import spark.implicits._
    val docs = Seq((0L, "abc de")).toDF("doc_id", "text")
    val (_, vocabF) = graft.text.Text.bpeTrainState(spark, docs, 0)
    val out = graft.text.Text.bpeEncodeDocs(docs, vocabF).collect()
    assert(out(0).getLong(1) === 2L) // pieces: abc, de
    assert(out(0).getLong(2) === 5L) // tokens = characters
  }

  test("registered query trains the full 50 merges on the documents table") {
    val out = graft.text.Text.bpeMerges.run(spark, sfDir).collect()
    assert(out.length === 50)
    assert(out.map(_.getInt(0)).toSeq === (1 to 50))
    assert(out.forall(r => r.getLong(4) > 0))
    assert(out.forall(r => r.getString(3) === r.getString(1) + r.getString(2)))
    // merges must be learned ON TOP of earlier merges at least once
    // (a multi-char left or right side proves iterative composition)
    assert(out.exists(r => r.getString(1).length > 1 || r.getString(2).length > 1))
  }
}
