package graft

import org.apache.spark.sql.functions._

import graft.gfunctions._

/** The optimizer rule turns user-written HOF dot products into the
  * native kernel, with identical results including null semantics.
  */
class DotProductRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (s, v) => s + v)

  test("HOF dot product is rewritten to graft_dot in the optimized plan") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val df = e.select(hofDot($"v", $"v").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    // value parity with the native helper on the same rows
    val native = e.select(dotProduct($"v", $"v").as("d")).as[Double].collect()
    assert(df.as[Double].collect().toSeq === native.toSeq)
  }

  test("SQL-text HOF form is rewritten too") {
    graft.sources.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_rw")
    val df = spark.sql(
      """SELECT aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),
        |  (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS d FROM emb_rw""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.as[Double].collect().forall(_ > 0))
  }

  test("null semantics preserved: length mismatch and null element give null") {
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0)),          // length mismatch
    ).toDF("a", "b")
    assert(df.select(hofDot($"a", $"b")).head().isNullAt(0))
    val withNull = spark.sql(
      "SELECT aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d), (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS d")
    assert(withNull.head().isNullAt(0))
  }

  test("non-dot HOF aggregates are left alone") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with($"a", $"b", (p, q) => p + q), lit(0.0), (s, v) => s + v).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.as[Double].head() === 10.0)
  }
}
