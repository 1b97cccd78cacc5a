package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopK.perKey equals the full window row_number formulation. */
class TopKSpec extends SparkSpec {

  test("perKey(k=2) == window row_number <= 2 on orders") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val fast = graft.olap.TopK.perKey(o, Seq("o_custkey"), order, 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("o_custkey").orderBy(order: _*)
    val reference = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(fast.count() === reference.count())
    assert(fast.exceptAll(reference).isEmpty && reference.exceptAll(fast).isEmpty)
  }

  test("perKey survives multi-partition input (repartitioned 13 ways)") {
    val o = graft.sources.Tables.orders(spark, sfDir).repartition(13)
    val order = Seq(col("o_orderdate"), col("o_orderkey"))
    val fast = graft.olap.TopK.perKey(o, Seq("o_custkey"), order, 1)
    val w = Window.partitionBy("o_custkey").orderBy(order: _*)
    val reference = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    assert(fast.exceptAll(reference).isEmpty && reference.exceptAll(fast).isEmpty)
  }
}
