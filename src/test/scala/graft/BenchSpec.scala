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

  // The driver records only the last ~2000 stdout chars (BENCH_r01-r08
  // all have parsed:null because the full 6 KB line never fit). The
  // final printed line must parse standalone within that budget.
  test("compactLine fits the tail budget and keeps the costliest queries") {
    val timings = (1 to 140).map(i => (f"q_some_operator_name_$i%03d", i * 0.1))
    val line = Bench.compactLine(timings.map(_._2).sum, timings,
      errors = Map("q_bad" -> "SomeException: it broke"),
      gcMs = 1234, loadAvg = 5.67, sfDir = "/root/testdata/sf0.1",
      subsetTag = "")
    assert(line.length <= 1700, s"line too long: ${line.length}")
    assert(!line.contains("\n"))
    // costliest query always survives truncation; cheapest is dropped
    assert(line.contains("q_some_operator_name_140"))
    assert(!line.contains("\"q_some_operator_name_001\""))
    assert(line.contains("\"queries_omitted\":"))
    assert(line.contains("\"n_errors\":1"))
    assert(line.contains("\"full\":\"bench_out.json\""))
    // structural JSON sanity without a parser dependency: balanced
    // braces/quotes and the contract keys present
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 === 0)
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.endsWith("}"))
  }

  test("compactLine bounds inline errors: a many-failure run still fits the tail") {
    // the run a consumer MOST needs to parse is one where many queries
    // failed — unbounded inline errors would blow the tail budget and
    // reintroduce parsed:null exactly there
    val errors = (1 to 60).map(i =>
      f"q_failing_operator_$i%03d" -> ("SomeLongException: " + "x" * 120)).toMap
    val timings = (1 to 80).map(i => (f"q_ok_$i%03d", i * 0.1))
    val line = Bench.compactLine(timings.map(_._2).sum, timings, errors,
      gcMs = 99, loadAvg = 2.0, sfDir = "/x", subsetTag = "")
    assert(line.length <= 1700, s"line too long: ${line.length}")
    assert(line.contains("\"n_errors\":60"))
    assert(line.contains("\"errors_omitted\":"))
    // sorted order: the first error key always survives the cap
    assert(line.contains("q_failing_operator_001"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 === 0)
  }

  // The round scripts' cleanliness gate is `head -c 120 | grep` on the
  // artifact (the driver tail is truncated, so a full-line grep can't
  // be the contract). The r16 sweep landed an errored sf10 artifact as
  // "clean" because n_errors sat at the END of the line and degraded
  // was never emitted at all — both now live in the first 120 bytes.
  test("compactLine head bytes carry n_errors and degraded (gate contract)") {
    val timings = (1 to 140).map(i => (f"q_op_$i%03d", i * 0.1))
    val dirty = Bench.compactLine(timings.map(_._2).sum, timings,
      errors = Map("q_bad" -> "IOException: disk full"),
      gcMs = 1, loadAvg = 1.0, sfDir = "/x", subsetTag = "",
      loadAvgStart = 50.0)
    val head = dirty.take(120)
    assert(head.contains("\"n_errors\":1"))
    assert(head.contains("\"degraded\":true"), s"head was: $head")
    val clean = Bench.compactLine(timings.map(_._2).sum, timings,
      errors = Map.empty, gcMs = 1, loadAvg = 1.0, sfDir = "/x",
      subsetTag = "", loadAvgStart = 0.5)
    val cleanHead = clean.take(120)
    assert(cleanHead.contains("\"n_errors\":0"))
    assert(cleanHead.contains("\"degraded\":false"))
    // the r16 gate (grep '"degraded":false' on the head) must flag the
    // errored artifact dirty under the r17 rule (n_errors:0 AND
    // degraded:false, both in the head)
    assert(!(dirty.take(120).contains("\"n_errors\":0") &&
      dirty.take(120).contains("\"degraded\":false")))
  }

  test("compactLine with few queries includes them all, no omission tag") {
    val timings = Seq("q1" -> 1.5, "q2" -> 0.5)
    val line = Bench.compactLine(2.0, timings, Map.empty, 10, 1.0, "/x", "")
    assert(line.contains("\"q1\":1.500") && line.contains("\"q2\":0.500"))
    assert(!line.contains("queries_omitted"))
    assert(line.contains("\"n_errors\":0"))
  }
}
