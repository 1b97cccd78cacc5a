package graft.tools

/** Same-JVM interleaved A/B of d_prefix_containment's fixed-cap vs
  * adaptive-cap plans — `PrefixAb <sfDir> [outFile]`.
  *
  * Why a dedicated tool: the operator runs sub-2 s at sf1, and this
  * host's burst noise (3 separate Bench invocations of identical code
  * measured 1.26/1.51/2.03 s in r9) swamps any cross-invocation
  * comparison at that wall. Interleaving A and B inside ONE JVM under
  * one warmed session is the only capture where their DIFFERENCE is
  * meaningful; min-of-N per variant, all raw times reported so a
  * degraded capture self-identifies.
  */
object PrefixAb {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(6)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    // load sampled BEFORE the measured work — see Capture.degraded
    val loadStart = Capture.loadAvg()
    // warm: one run of each variant, untimed
    graft.dedup.Dedup.prefixPairs(spark, sfDir, Some(1000L)).count()
    graft.Caching.releaseTransient()
    graft.dedup.Dedup.prefixPairs(spark, sfDir, None).count()
    graft.Caching.releaseTransient()

    def timed(cap: Option[Long]): Double = {
      val t0 = System.nanoTime()
      graft.dedup.Dedup.prefixPairs(spark, sfDir, cap).count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.Caching.releaseTransient()
      t
    }
    val fixed = scala.collection.mutable.ArrayBuffer[Double]()
    val adaptive = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to runs) { // interleaved so load drift hits both arms
      fixed += timed(Some(1000L))
      adaptive += timed(None)
    }
    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(xs: Seq[Double]) = xs.map(num).mkString("[", ",", "]")
    val loadAvg = Capture.loadAvg()
    val line =
      s"""{"metric":"prefix_ab","degraded":${Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","runs":$runs,""" +
        s""""fixed_min":${num(fixed.min)},"adaptive_min":${num(adaptive.min)},""" +
        s""""premium_sec":${num(adaptive.min - fixed.min)},""" +
        s""""fixed_all":${arr(fixed.toSeq)},"adaptive_all":${arr(adaptive.toSeq)},""" +
        s""""fixed_spread":${num(fixed.max / fixed.min)},""" +
        s""""adaptive_spread":${num(adaptive.max / adaptive.min)},""" +
        s""""load_avg":${num(loadAvg)}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
