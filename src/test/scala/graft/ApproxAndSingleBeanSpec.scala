package graft

import org.apache.spark.sql.functions._

class ApproxAndSingleBeanSpec extends SparkSpec {
  import spark.implicits._

  test("q_approx_distinct lands within the HLL++ error envelope") {
    val approx = graft.olap.Olap2.approxDistinct.run(spark, sfDir)
    val exact = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"))
    val joined = approx.join(exact, "o_orderpriority")
      .select($"o_orderpriority", $"approx_customers", $"exact").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  // Regression pin: HLL++ over deterministic input is deterministic —
  // a sketch-implementation change inside the 10% envelope above
  // would pass the bound silently but move these committed values.
  test("q_approx_distinct matches committed goldens at sf0.001") {
    val got = graft.olap.Olap2.approxDistinct.run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(
      ("1-URGENT", 131L, 273L),
      ("2-HIGH", 125L, 316L),
      ("3-MEDIUM", 131L, 320L),
      ("4-NOT SPECIFIED", 126L, 297L),
      ("5-LOW", 130L, 294L))
    assert(got === want, s"sketch output moved: $got")
  }

  test("single-mbean responses normalize to the wildcard record shape") {
    val single =
      """{"status":200,"timestamp":1700000500,
         "request":{"mbean":"kafka.server:type=ReplicaManager,name=LeaderCount","type":"read"},
         "value":{"Value":"7"}}"""
    val df = Seq((single, "host-9", "KafkaBroker")).toDF("payload", "host", "server_type")
    val out = graft.jolokia.Jolokia.normalizeSingle(df, "payload", "host", "server_type").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("injected_bean_name") === "kafka.server")
    assert(r.getAs[Map[String, String]]("bean_props") ===
      Map("type" -> "ReplicaManager", "name" -> "LeaderCount"))
    assert(r.getAs[String]("attribute") === "Value")
    assert(r.getAs[String]("value") === "7")
    // identical column set as the wildcard path
    val wide = graft.jolokia.Jolokia.normalize(
      Seq(("""{"status":200,"timestamp":1,"request":{"mbean":"a:b=c","type":"read"},"value":{"a:b=c":{"X":"1"}}}""",
        "h", "t")).toDF("payload", "host", "server_type"),
      "payload", "host", "server_type")
    assert(wide.columns.toSeq ===
      graft.jolokia.Jolokia.normalizeSingle(df, "payload", "host", "server_type").columns.toSeq)
  }
}
