package graft

import org.apache.spark.sql.functions._

/** Behavioral contract for t_dsir (importance resampling): documents
  * made of target-distinctive n-grams must outweigh documents made of
  * background n-grams, weights are deterministic, and the registered
  * selection is well-formed.
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("target-distinctive docs outweigh background docs") {
    // Target sample = docs 1..3 (all heavy in 'quantum'-style grams);
    // raw background = docs 10..29 ('market' grams). A fresh doc made
    // of target grams (id 40) must score above one made of background
    // grams (id 41).
    val target = (1L to 3L).map(i => (i, "quantum flux lattice quantum flux entangle lattice"))
    val noise = (10L to 29L).map(i => (i, s"market price m$i trade volume index market price"))
    val probes = Seq(
      (40L, "quantum flux lattice entangle quantum flux"),
      (41L, "market price trade volume index market"))
    val docs = (target ++ noise ++ probes).toDF("doc_id", "text")
    val w = graft.text.Text.dsirWeights(docs, isTarget = col("doc_id") <= 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(40L) > w(41L),
      s"target-gram doc ${w(40L)} not above background-gram doc ${w(41L)}")
    // and the background doc's weight must be negative: its grams are
    // LESS likely under the target model than under raw
    assert(w(41L) < 0)
  }

  test("weights are deterministic across recomputation") {
    val docs = (1L to 60L).map(i => (i, s"tok$i alpha beta t${i % 7} gamma")).toDF("doc_id", "text")
    val a = graft.text.Text.dsirWeights(docs).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = graft.text.Text.dsirWeights(docs).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a === b)
  }

  test("registered query: exactly top-K rows, ranks contiguous, weights non-increasing") {
    val rows = graft.text.Text.dsir.run(spark, sfDir).collect()
    assert(rows.length === graft.text.Text.DsirTopK)
    assert(rows.map(_.getInt(0)).toSeq === (1 to graft.text.Text.DsirTopK))
    val ws = rows.map(_.getDouble(2)).toSeq
    assert(ws.zip(ws.tail).forall { case (x, y) => x >= y }, "weights not non-increasing")
  }
}
