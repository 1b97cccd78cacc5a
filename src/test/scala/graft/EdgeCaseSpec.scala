package graft

import org.apache.spark.sql.functions._

import graft.gfunctions._

/** Degenerate inputs must not throw or mis-compute. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash: empty string hashes to 0; single char to its code") {
    val r = Seq(("", "a")).toDF("e", "a")
      .select(polyHash($"e"), polyHash($"a")).head()
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 'a'.toLong)
  }

  test("dotProduct: empty arrays give 0.0; empty vs non-empty gives null") {
    val df = Seq((Array.empty[Double], Array.empty[Double], Array(1.0)))
      .toDF("e1", "e2", "x")
    val r = df.select(dotProduct($"e1", $"e2"), dotProduct($"e1", $"x")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.isNullAt(1))
  }

  test("Temporal.asofJoin: empty right side yields all-null right columns") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "lts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "rts", "rv")
      .select($"k", $"rts", $"rv".as("r_val"))
    val out = graft.olap.Temporal.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("r_val"))
    assert(out.count() === 1)
    assert(out.head().isNullAt(out.columns.indexOf("r_val")))
  }

  test("Dedup pipelines: documents shorter than a shingle produce no pairs, no errors") {
    val tiny = Seq((1L, "one two"), (2L, "one two")).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.ngramJaccardPairs(tiny).count() === 0)
    assert(graft.dedup.Dedup.minhashLshPairs(tiny).count() === 0)
    // exact dedup still groups them (hash of full text, no shingles needed)
    assert(graft.dedup.Dedup.exactGroups(tiny).filter($"group_size" === 2).count() === 2)
  }

  test("connectedComponents: empty edge list yields empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.dedup.Dedup.connectedComponents(edges).count() === 0)
  }

  test("safeDiv / cosine: zero divisor and zero-norm vector yield NULL, not ANSI errors") {
    val r = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("z", "v")
      .select(cosine($"z", $"v"), safeDiv(lit(1.0), lit(0.0)), safeDiv(lit(5L), lit(0L)))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("TopK.perKey with k larger than group size returns whole groups") {
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val out = graft.olap.TopK.perKey(df, Seq("k"), Seq(col("v").desc), 100)
    assert(out.count() === 3)
  }
}
