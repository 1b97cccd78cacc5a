package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-at-scale probe for the three REGISTERED ADC compositions —
  * `ResidualProbe <sfDir> [outFile]`.
  *
  * AnnProbe measures the adaptive-k regime through searchIvfAdcProbes,
  * which IS the plain s_ivf_adc body — but the residual and OPQ
  * variants' recall had only ever been measured at spec scale. This
  * tool drives the three registry entries VERBATIM (SparkEntry.queries
  * — same probes, same k=8 gate index, same adaptive shortlist) on a
  * large corpus, where the gate shape itself becomes the
  * large-candidate regime: at 2M vectors, k=8 and nprobe=2 put
  * ~500k candidates behind every probe — 4000× the oracle gate and
  * well past the volumes that collapsed the fixed-50 shortlist
  * (ANNPROBE_VEC2M_r10: recall 0.077 at 140k). Recall@3 is scored
  * against exact brute-force cosine for the queries' own probe set
  * (vec_id < 10), so the number is the production answer quality of
  * the shipped operators at that candidate volume, reimplementing
  * nothing.
  */
object ResidualProbe {

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val runs = sys.env.get("SPARK_GRAFT_ANN_RUNS").map(_.toInt).getOrElse(2)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val loadStart = graft.tools.Capture.loadAvg()

    val e = Sim.vecs(spark, sfDir).select(col("vec_id"), col("v"))
    val n = e.count()
    // exact top-3 for the registered queries' own probe frame
    // (vec_id < 10), once — the denominator for every operator below
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cs").desc, col("neighbor_id"))
    val brute = graft.Caching.releaseAfter(
      broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("v").as("pv")))
        .join(e.select(col("vec_id").as("neighbor_id"), col("v")),
          col("neighbor_id") =!= col("probe_id"))
        .select(col("probe_id"), col("neighbor_id"),
          graft.gfunctions.cosine(col("pv"), col("v")).as("cs"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("probe_id"), col("neighbor_id")))
    val denom = brute.count().toDouble
    // a zero denominator means the corpus has no probes/neighbors —
    // fail loudly rather than publish a vacuous recall_at3 = 1.0
    // artifact from a run that measured nothing
    if (denom == 0)
      sys.error(s"ResidualProbe: brute-force top-3 is EMPTY for $sfDir " +
        s"(n=$n) — degenerate corpus, refusing to emit a recall artifact")

    val registry = graft.SparkEntry.queries
    val ops = Seq("s_ivf_adc", "s_ivf_adc_residual", "s_opq_adc")
    val results = ops.map { name =>
      val run = registry(name)
      def once: DataFrame = run(spark, sfDir)
      val secs = (1 to runs).map(_ => time(once.count())._2)
      val found = once.select(col("probe_id"), col("neighbor_id"))
      val recall =
        found.join(brute, Seq("probe_id", "neighbor_id")).count() / denom
      (name, secs.min, recall)
    }

    val loadAvg = graft.tools.Capture.loadAvg()
    val cand = 2L * n / 8 // the registered queries' k=8, nprobe=2 shape
    val per = results.map { case (name, sec, recall) =>
      s""""$name":{"sec":${num(sec)},"recall_at3":${num(recall)}}"""
    }.mkString(",")
    val line =
      s"""{"metric":"residual_probe","degraded":${graft.tools.Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","n":$n,""" +
        s""""cand_per_probe":$cand,"shortlist":${Sim.adcShortlist(cand)},""" +
        s""""shortlist_rule":"max(50,cand/12)",""" +
        s""""runs":$runs,$per,"load_avg":${num(loadAvg)}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
