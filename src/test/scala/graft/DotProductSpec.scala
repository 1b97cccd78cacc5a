package graft

import org.apache.spark.sql.functions._

import graft.gfunctions._

/** Native DotProduct expression: numeric parity with the HOF
  * formulation (same left-fold order), null propagation, and SQL
  * registration via GraftExtensions.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (s, v) => s + v)

  test("bit-identical to the aggregate/zip_with fold") {
    val df = Seq((Array(1.0, 2.5, -3.0, 0.1), Array(4.0, -1.0, 0.5, 10.0)))
      .toDF("a", "b")
    val Array(native, hof) =
      df.select(dotProduct($"a", $"b"), hofDot($"a", $"b")).as[(Double, Double)].head() match {
        case (x, y) => Array(x, y)
      }
    assert(native === hof)
    assert(native === (4.0 + -2.5 + -1.5 + 1.0))
  }

  test("null input propagates null") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(dotProduct($"a", $"b")).head().isNullAt(0))
  }

  test("registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r === 11.0)
  }

  test("float-array columns are cast, matching the embeddings schema") {
    val e = graft.sources.Tables.embeddings(spark, sfDir).limit(5)
    val out = e.select(dotProduct(col("embedding"), col("embedding")).as("n2"))
      .as[Double].collect()
    assert(out.forall(_ > 0))
  }
}
