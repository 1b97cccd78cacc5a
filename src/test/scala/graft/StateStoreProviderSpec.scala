package graft

/** The RocksDB state-store knob (GraftSession's SPARK_GRAFT_ROCKSDB /
  * `spark.sql.streaming.stateStore.providerClass`) must be output-
  * invariant: the provider changes WHERE state lives (executor heap vs
  * off-heap RocksDB), never what a stateful operator computes. Gates
  * the escape-hatch configuration a state-exceeds-heap deployment
  * flips on.
  */
class StateStoreProviderSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stateful sessionize output is identical under the RocksDB provider") {
    // newSession shares the SparkContext but owns its SQLConf, so the
    // provider override is scoped to this spec and cannot leak into
    // the shared session's streaming queries.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val default = rows(graft.streaming.Streaming.streamSessions.run(spark, sfDir))
    val rocksdb = rows(graft.streaming.Streaming.streamSessions.run(s2, sfDir))
    assert(rocksdb === default)
    assert(default.nonEmpty)
  }
}
