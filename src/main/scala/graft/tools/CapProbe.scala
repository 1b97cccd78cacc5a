package graft.tools

import org.apache.spark.sql.functions._

/** Duplication-regime probe for the adaptive df cap —
  * `CapProbe <dataDir>`.
  *
  * Prints one JSON line with the cap [[graft.dedup.Dedup.adaptiveDfCap]]
  * derives on the dir's documents table, plus the near-dup pair count
  * under the adaptive cap vs the fixed cap. The contract under test is
  * the one the cap's Scaladoc states: on a low-duplication corpus the
  * budget is slack, the cap resolves to maxCap, and output is
  * bit-identical to the fixed-cap plan; on a replica-heavy corpus the
  * cap tightens (observable here as cap < 1000) so the pair stage
  * stays linear in corpus size. AdaptiveBlockingSpec proves this on
  * toy data; this tool measures it on the GenScale stress corpora at
  * factors the unit suite cannot reach.
  */
object CapProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val docs = graft.sources.Tables.documents(spark, dir)
    val nDocs = docs.count()

    val entries = graft.dedup.Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("shs")).as("shingle"))
    val cap = graft.dedup.Dedup.adaptiveDfCap(entries, nDocs)

    def timedCount(adaptive: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup
        .ngramJaccardPairs(docs, adaptive = adaptive).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (adaptivePairs, adaptiveSec) = timedCount(adaptive = true)
    // fixed-cap reference: identical output is the LOW-DUP contract,
    // so it only runs when the cap did not tighten (or when --fixed
    // forces it) — on the adversarial corpus the uncapped pair mass is
    // the very thing that exhausted local disk in the r5 probe.
    val fixed =
      if (cap == 1000L || args.contains("--fixed"))
        Some(timedCount(adaptive = false))
      else None

    def num2(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val fixedJson = fixed match {
      case Some((n, s)) =>
        s""""pairs_fixed":$n,"identical":${adaptivePairs == n},"sec_fixed":${num2(s)}"""
      case None => """"pairs_fixed":null,"identical":null,"sec_fixed":null"""
    }
    val line =
      s"""{"dir":"$dir","n_docs":$nDocs,"adaptive_cap":$cap,""" +
        s""""pairs_adaptive":$adaptivePairs,"sec_adaptive":${num2(adaptiveSec)},""" +
        fixedJson + "}"
    val outPath = sys.env.get("SPARK_GRAFT_CAPPROBE_OUT")
    outPath.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    try { spark.sparkContext.setLogLevel("OFF"); graft.Caching.releaseAll(); spark.stop() }
    catch { case _: Throwable => () }
    println(line)
  }
}
