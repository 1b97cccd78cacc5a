package graft

/** Ad-hoc plan dump helper (test scope only, not registered). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.01"
    println("==BEGIN")
    for (name <- Seq("d_ngram_jaccard", "d_minhash_lsh", "q_semi_anti", "m2_window_rollup")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.count(_.trim.contains("Exchange hashpartitioning"))
      val reused = p.linesIterator.count(l => l.contains("InMemoryTableScan"))
      val scans = p.linesIterator.count(l => l.contains("Scan parquet"))
      println(s"$name: exchanges=$exchanges reused=$reused parquetScans=$scans")
    }
    println("==END")
    spark.stop()
  }
}
