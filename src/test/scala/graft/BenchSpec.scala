package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench's measurement contract: a query that THROWS must surface in
  * `errors` and never contribute a timing (the r4 bench silently
  * recorded the wall time of failures as successes), and per-query
  * run spread is recorded so a contended-host capture
  * self-identifies.
  */
class BenchSpec extends SparkSpec {

  test("a deliberately-broken query lands in errors, not in timings") {
    val qs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_query" -> ((s, d) => graft.sources.Tables.nation(s, d)),
      "broken_query" -> ((_, _) => throw new IllegalStateException("deliberately broken")))
    val r = Bench.measure(spark, sfDir, qs)
    assert(r.timings.map(_._1) === Seq("ok_query"))
    assert(r.timings.forall(_._2 > 0))
    assert(r.errors.keySet === Set("broken_query"))
    assert(r.errors("broken_query").contains("deliberately broken"))
  }

  test("spread = run_max/run_min is recorded per succeeded query only") {
    val qs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_query" -> ((s, d) => graft.sources.Tables.region(s, d)),
      "broken_query" -> ((_, _) => throw new IllegalStateException("boom")))
    val r = Bench.measure(spark, sfDir, qs, runs = 3)
    assert(r.spreads.contains("ok_query"))
    assert(r.spreads("ok_query") >= 1.0)
    assert(!r.spreads.contains("broken_query"))
  }

  test("a query failing on its second run is an error, not a timing") {
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, d) => {
      calls += 1
      if (calls >= 2) throw new RuntimeException("fails on rerun")
      graft.sources.Tables.nation(s, d)
    }
    val r = Bench.measure(spark, sfDir, Seq("flaky" -> flaky))
    assert(r.timings.isEmpty)
    assert(r.errors.keySet === Set("flaky"))
  }
}
