package graft.sim

import org.apache.spark.sql.functions._

/** Blocked-vs-exact A/B for d_embed_dup's scale path —
  * `EmbedDupProbe <sfDir> [outFile]`.
  *
  * Runs the cell-blocked pair search (the >cutoff default) and the
  * exact all-pairs tiles over the same corpus in one JVM, and reports
  * wall clock for both plus pair-level recall (blocked ∩ exact /
  * exact — the blocked path is spec-pinned to never invent a pair, so
  * precision is 1 by construction and re-asserted here). This is the
  * committed artifact behind the claim that the blocked default
  * covers the exact operator's decision at a fraction of its n² cost.
  */
object EmbedDupProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    // load sampled BEFORE the measured work — see Capture.degraded
    val loadStart = graft.tools.Capture.loadAvg()

    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(body: => org.apache.spark.sql.DataFrame): (org.apache.spark.sql.DataFrame, Double, Long) = {
      val t0 = System.nanoTime()
      val df = body
      val nRows = df.count()
      (df, (System.nanoTime() - t0) / 1e9, nRows)
    }

    val n = Sim.vecs(spark, sfDir).count()
    val (blocked, secBlocked, nBlocked) =
      timed(graft.Caching.releaseAfter(Sim.embedDupPairs(spark, sfDir, 0.45)))
    val (exact, secExact, nExact) = timed(graft.Caching.releaseAfter(
      Embed.cosinePairs(graft.sources.Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", 0.45)))
    val common = blocked.join(exact, Seq("id_a", "id_b", "cos_sim")).count()
    val recall = if (nExact == 0) 1.0 else common.toDouble / nExact
    val invented = nBlocked - common
    // Stratify recall by cosine: the pairs a dedup pass ACTS on are
    // the high-cosine ones; near-threshold pairs between unrelated
    // vectors (cos barely over the gate — the bulk of a uniform
    // corpus' pair set) carry no dedup decision and are the ones cell
    // blocking misses.
    def bandRecall(lo: Double): (Long, Double) = {
      val ex = exact.filter(col("cos_sim") >= lo)
      val nEx = ex.count()
      val c = blocked.filter(col("cos_sim") >= lo)
        .join(ex, Seq("id_a", "id_b", "cos_sim")).count()
      (nEx, if (nEx == 0) 1.0 else c.toDouble / nEx)
    }
    val (nHi6, recall6) = bandRecall(0.6)
    val (nHi75, recall75) = bandRecall(0.75)

    val loadAvg = graft.tools.Capture.loadAvg()
    val line =
      s"""{"metric":"embed_dup_ab","degraded":${graft.tools.Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","n_vectors":$n,""" +
        s""""sec_blocked":${num(secBlocked)},"sec_exact":${num(secExact)},""" +
        s""""speedup":${num(secExact / math.max(secBlocked, 1e-9))},""" +
        s""""pairs_blocked":$nBlocked,"pairs_exact":$nExact,""" +
        s""""recall":${num(recall)},"invented_pairs":$invented,""" +
        s""""pairs_exact_ge06":$nHi6,"recall_ge06":${num(recall6)},""" +
        s""""pairs_exact_ge075":$nHi75,"recall_ge075":${num(recall75)},""" +
        s""""load_avg":${num(loadAvg)}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
