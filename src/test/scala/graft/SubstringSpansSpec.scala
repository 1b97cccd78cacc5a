package graft

import org.apache.spark.sql.functions._

/** Hand-checkable contract for d_substring_spans (the Lee-et-al-style
  * exact-substring dedup): cross-doc shared runs produce merged spans
  * of the right length, within-doc repetition is caught, unique docs
  * are absent, and the interval-union formula handles overlapping and
  * disjoint windows.
  */
class SubstringSpansSpec extends SparkSpec {

  import spark.implicits._

  test("shared cross-doc run: overlapping windows merge into one span of the run's length") {
    // L=5; docs A and B share the 7-token run s1..s7 at different
    // offsets; every other token is unique per doc.
    val docs = Seq(
      (1L, "u1 u2 u3 s1 s2 s3 s4 s5 s6 s7 u4 u5 u6"), // run at pos 4..10 of 13
      (2L, "w1 w2 s1 s2 s3 s4 s5 s6 s7 w3 w4 w5 w6"), // run at pos 3..9 of 13
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12"), // fully unique
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.substringSpanStats(docs, L = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // a 7-token shared run yields 3 five-token windows (positions
    // p, p+1, p+2); union length = 5 + 1 + 1 = 7 — the run, exactly
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((3L, 7L, math.rint(7.0 / 13 * 10000) / 10000)))
    assert(out(2L) === ((3L, 7L, math.rint(7.0 / 13 * 10000) / 10000)))
  }

  test("within-doc repetition: distant repeated run counted as two disjoint spans") {
    val docs = Seq(
      (3L, "c1 r1 r2 r3 r4 r5 c2 c3 c4 c5 c6 r1 r2 r3 r4 r5 c7"), // run at 2 and 12 of 17
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.substringSpanStats(docs, L = 5).collect()
    assert(out.length === 1)
    val r = out.head
    // two matching windows, gap 10 > L ⇒ two disjoint 5-token spans
    assert((r.getLong(2), r.getLong(3)) === ((2L, 10L)))
  }

  test("sub-L shared content produces no spans; short docs produce no windows") {
    val docs = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 x3 x4 x5"), // shares only a 4-token run with doc 2
      (2L, "y1 y2 s1 s2 s3 s4 y3 y4 y5"),
      (3L, "z1 z2 z3"),                    // shorter than L
    ).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.substringSpanStats(docs, L = 5).count() === 0)
  }

  test("registered query returns well-formed rows on testdata") {
    val out = graft.dedup.Dedup.substringSpans.run(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= graft.dedup.Dedup.SpanLen) // dup_tokens ≥ L by construction
      assert(r.getLong(3) <= r.getLong(1), "covered tokens cannot exceed doc tokens")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
    }
  }
}
