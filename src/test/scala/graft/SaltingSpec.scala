package graft

import org.apache.spark.sql.functions._

import graft.gfunctions._

/** The salted skew join returns exactly the plain join's rows. */
class SaltingSpec extends SparkSpec {

  test("saltedJoin == plain inner join on orders ⋈ customer") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val c = graft.sources.Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = saltedJoin(o, c, "o_custkey", 8, Seq("o_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).isEmpty)
  }

  test("salt is deterministic and within range") {
    val o = graft.sources.Tables.orders(spark, sfDir)
      .select(salt(8, col("o_orderkey")).as("s"))
    val bounds = o.agg(min("s"), max("s")).head()
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) < 8)
  }
}
