package graft.tools

/** Output-size probe for the simhash family — `SimProbe <dataDir>`.
  *
  * Prints the pair count and hamming histogram of d_simhash on a data
  * dir. Scale adjudication needs this because the operator's cost has
  * two regimes: plan-bound (signature + blocked candidate join, linear
  * in corpus size) and OUTPUT-bound (a corpus whose perturbation sits
  * inside the hamming gate yields pairs quadratic in its duplication
  * factor — an intrinsic property of the data, not a plan defect).
  * The histogram says which regime a slow measurement is in.
  */
object SimProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val docs = graft.sources.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.simhashPairs(docs)
      .groupBy("hamming").count().orderBy("hamming")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    val total = pairs.map(_._2).sum
    val hist = pairs.map { case (h, n) => s""""$h":$n""" }.mkString("{", ",", "}")
    println(s"""{"dir":"$dir","pairs":$total,""" +
      s""""sec":${String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))},""" +
      s""""by_hamming":$hist}""")
    try { graft.Caching.releaseAll(); spark.stop() } catch { case _: Throwable => () }
  }
}
