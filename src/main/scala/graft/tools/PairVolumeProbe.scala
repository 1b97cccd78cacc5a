package graft.tools

import org.apache.spark.sql.functions._

/** Validates d_dup_profile's pair-volume PREDICTION against the
  * candidate-pair mass the inverted-index operators actually generate
  * on the same corpus — `PairVolumeProbe <sfDir> [outFile]`
  * (VERDICT r11 Next #5, second clause: "d_dup_profile's prediction
  * should be checked against the observed pair volume at the new
  * decade").
  *
  * The profile's shingle_df histogram carries EXACT per-bucket pair
  * mass Σ df·(df−1)/2 in floor-power-of-2 buckets (1024 = open top);
  * the operators pair only shingles with 2 ≤ df ≤ cap, where cap is
  * the adaptive budget rule (PairMassPerDoc × nDocs). The profile
  * therefore BRACKETS the operator-observed candidate mass:
  *
  *   Σ mass over buckets entirely under the cap
  *     ≤ observed ≤ Σ mass over buckets that reach the cap
  *
  * with uncertainty exactly the one bucket straddling the cap. The
  * probe computes the observed mass from the df table + the
  * operators' own cap rule, the bracket from dupProfileOf's output,
  * and emits both plus the uncapped total (what a pair pass without
  * the cap would generate — the number that explains WHY the cap
  * exists at the decade).
  */
object PairVolumeProbe {

  private[tools] def bucketHi(lo: Long): Long =
    if (lo >= 1024L) Long.MaxValue else 2 * lo - 1

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val loadStart = Capture.loadAvg()
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val dfFreq = graft.dedup.Dedup.shingleTable(docs)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = graft.dedup.Dedup.adaptiveDfCapFromDf(dfFreq, nDocs)
    def mass(cond: org.apache.spark.sql.Column): Long =
      dfFreq.filter(cond)
        .agg(coalesce(sum(((col("df") * (col("df") - 1)) / 2).cast("long")), lit(0L)))
        .head().getLong(0)
    val observed = mass(col("df").between(2, cap))
    val uncapped = mass(col("df") >= 2)

    val profile = graft.dedup.Dedup.dupProfileOf(docs)
      .filter(col("kind") === "shingle_df")
      .select("bucket_lo", "pair_mass").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val profLo = profile.filter { case (lo, _) => bucketHi(lo) <= cap }.map(_._2).sum
    val profHi = profile.filter { case (lo, _) => lo <= cap }.map(_._2).sum
    val holds = profLo <= observed && observed <= profHi

    val line =
      s"""{"metric":"pair_volume","degraded":${Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${"%.3f".formatLocal(java.util.Locale.ROOT, loadStart)},""" +
        s""""sf":"$sfDir","n_docs":$nDocs,"cap":$cap,""" +
        s""""budget_pairs":${graft.dedup.Dedup.PairMassPerDoc * nDocs},""" +
        s""""observed_capped_pair_mass":$observed,""" +
        s""""profile_bracket_lo":$profLo,"profile_bracket_hi":$profHi,""" +
        s""""bracket_holds":$holds,"uncapped_pair_mass":$uncapped,""" +
        s""""load_avg":${"%.3f".formatLocal(java.util.Locale.ROOT, Capture.loadAvg())}}"""
    if (!holds)
      System.err.println(s"[pairvol] BRACKET VIOLATION: $profLo <= $observed <= $profHi is false")
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
