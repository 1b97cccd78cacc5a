package graft

/** Recursive attribute flatten: nested JMX attribute objects become
  * path-concatenated keys like the reference's dict walk
  * (ReusableCodes.flatten).
  */
class NestedFlattenSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"status":200,"timestamp":1700000000,
       "request":{"mbean":"kafka.server:*","type":"read"},
       "value":{"kafka.server:type=Latency,name=Produce":
                {"Count":"42",
                 "Percentiles":"{\"p50\":\"3\",\"p99\":\"17\"}"}}}"""

  test("nested attribute objects flatten to dotted paths; scalars pass through") {
    val base = graft.jolokia.Jolokia.normalize(
      Seq((payload, "h1", "KafkaBroker")).toDF("payload", "host", "server_type"),
      "payload", "host", "server_type")
    val flat = graft.jolokia.Jolokia.flattenNestedAttrs(base)
    val rows = flat.orderBy("attribute").collect()
      .map(r => r.getAs[String]("attribute") -> r.getAs[String]("value"))
    assert(rows.toSeq === Seq(
      "Count" -> "42",
      "Percentiles.p50" -> "3",
      "Percentiles.p99" -> "17"))
    // non-attribute columns preserved
    assert(flat.columns.contains("injected_host_name"))
    assert(flat.columns.contains("bean_props"))
  }
}
