package graft

import org.apache.spark.sql.functions._

/** d_bloom_prefilter's contract: the bloom is pruning only — the
  * pipeline's output is IDENTICAL to the bloom-free incremental
  * computation (blooms have no false negatives; positives are
  * confirmed exactly), on both synthetic corpora and the testdata.
  */
class BloomPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private def key(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("bloom pipeline == exact incremental span stats on a synthetic corpus") {
    // corpus docs 1..10 (one shared 8-token run among them), batch
    // docs 100..103: two containing corpus runs, two fresh
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val corpus = (1L to 10L).map(i =>
      (i, s"c${i}a c${i}b $run c${i}c c${i}d c${i}e"))
    val batch = Seq(
      (100L, s"x1 x2 x3 $run x4 x5"),            // shares the corpus run
      (101L, s"y1 $run y2 y3 y4 y5 y6"),          // shares it too
      (102L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),   // fresh
      (103L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))   // fresh
    val docs = (corpus ++ batch).toDF("doc_id", "text")
    val exact = key(graft.dedup.Dedup.incrementalSpanStats(docs, 100L, L = 5).collect())
    val bloom = key(graft.dedup.Dedup.bloomSpanStats(docs, 100L, L = 5).collect())
    assert(bloom === exact)
    assert(exact.map(_._1).toSet === Set(100L, 101L), "only the run-sharing docs hit")
  }

  test("bloom pipeline == exact incremental span stats on testdata; pruning measured") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val thr = docs.agg(floor(lit(0.9) * (max("doc_id") + 1)).cast("long")).head().getLong(0)
    val exact = key(graft.dedup.Dedup.incrementalSpanStats(docs, thr).collect())
    val bloom = key(graft.dedup.Dedup.bloomSpanStats(docs, thr).collect())
    assert(bloom === exact)
    val wins = graft.dedup.Dedup.windowTable(docs)
    val batchWindows = wins.filter(col("doc_id") >= thr).count()
    val confirmed = exact.map(_._3).sum // dup_windows reaching the span stage
    info(s"batch windows $batchWindows -> confirmed dup windows $confirmed " +
      f"(join output ${100.0 * confirmed / math.max(batchWindows, 1)}%.1f%% of batch)")
  }
}
