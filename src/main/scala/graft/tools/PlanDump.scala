package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump `EXPLAIN FORMATTED` for every registered query to one file —
  * `PlanDump <sfDir> <outFile>`. PlanShapeSpec asserts the plan
  * invariants (pushdown, no cartesians); this artifact makes plan
  * REGRESSIONS diffable round-over-round and judge audits cheap: the
  * committed PLANS_r{N}.txt for two rounds diff directly because
  * queries are emitted in sorted-name order with a stable header.
  *
  * Plans are the pre-execution formatted plans (no job runs for the
  * explain itself; operator CONSTRUCTION may still run training memos
  * — BPE vocab, IVF centroids — exactly as Verify does).
  */
object PlanDump {

  /** Strip the per-session volatile identifiers (expression ids
    * `col#123`, `plan_id=456`, checkpoint RDD numbers, temp-view
    * sequence numbers) so two dumps of the SAME plan are
    * byte-identical and a round-over-round diff shows only real
    * structure changes, not id churn.
    */
  private[tools] def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("MapPartitionsRDD\\[\\d+\\]", "MapPartitionsRDD[x]")
      .replaceAll("graft_stream_\\d+", "graft_stream_x")
      // NB: replacement strings treat $ as a group ref — avoid it
      .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+@[0-9a-f]+", "Lambda(x)")
      .replaceAll("@[0-9a-f]{6,}", "@x") // JVM object identity hashes
      // createTempDirectory suffixes under any graft_* temp artifact
      .replaceAll("(graft_[a-z_]+)\\d{6,}", "$1x")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args.take(2)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val sb = new StringBuilder
    sb ++= s"# graft plan dump — EXPLAIN FORMATTED, all registered queries\n"
    sb ++= s"# sfDir: $sfDir  spark: ${spark.version}\n"
    var failed = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      sb ++= s"\n===== $name =====\n"
      try {
        val df = fn(spark, sfDir)
        sb ++= normalize(
          df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      } catch {
        case e: Throwable =>
          failed += 1
          sb ++= s"EXPLAIN FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}\n"
      }
      graft.Caching.releaseTransient()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"[plandump] wrote $outFile (${graft.SparkEntry.queries.size} queries, $failed failed)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
