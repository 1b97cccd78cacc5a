package graft

/** Partition-width invariance: results must not depend on shuffle
  * width or row placement — the invariant Par.spread (and any cluster
  * re-split of the input) relies on. Runs representative memo-free
  * operators under two very different shuffle widths and requires
  * identical output. A failure here means an operator has an
  * order-dependent aggregate (double sum, unsorted collect_list)
  * that the fixed-partitioning DuckDB gate cannot catch.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def underWidth[T](n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  // memo-free operators spanning the heavy families (dedup inverted
  // index, DSIR model+score, profile aggregates, LM train+score)
  private val ops = Seq("d_minhash_lsh", "d_containment", "t_dsir",
    "q_profile", "t_ngram_lm")

  for (q <- ops) {
    test(s"$q is invariant to shuffle width (5 vs 17)") {
      val run = SparkEntry.queries(q)
      val narrow = underWidth(5)(rows(run(spark, sfDir)))
      val wide = underWidth(17)(rows(run(spark, sfDir)))
      assert(narrow === wide)
    }
  }
}
