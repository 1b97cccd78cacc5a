package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-index LAYOUT A/B — `AnnLayoutAb <sfDir> [outFile]`.
  *
  * The r13 sustained-serving capture showed the ANN knee is
  * SCAN-bound: the broadcast-probes join walks the whole assigned
  * corpus per micro-batch. The 100 TB design answer is a
  * cid-partitioned index layout so dynamic partition pruning (DPP)
  * skips every cell no probe routed to — this tool measures that
  * claim instead of asserting it: the SAME adaptive index is written
  * flat and `partitionBy("cid")`, the same small probe batch (the
  * sparse-routing regime, where batches touch a fraction of cells)
  * searches both layouts from DISK (both sides cold per rep — the
  * layouts differ only in prunability), min-of-N wall per layout,
  * and the partitioned plan is checked for the `dynamicpruning`
  * subquery so a silently-unpruned run can't masquerade as the win.
  *
  * Knobs: SPARK_GRAFT_AB_PROBES (default 2 — 2·nprobe cells of k
  * touched), SPARK_GRAFT_AB_REPS (default 5).
  */
object AnnLayoutAb {

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
    val nProbes = sys.env.get("SPARK_GRAFT_AB_PROBES").map(_.toInt).getOrElse(2)
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").map(_.toInt).getOrElse(5)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val loadStart = Capture.loadAvg()

    val idx = graft.sim.Sim.ivfIndexAdaptive(spark, sfDir, iters = 3)
    val k = idx.centroids.size
    val nprobe = math.max(2, math.round(math.sqrt(k)).toInt)
    val flatDir = java.nio.file.Files.createTempDirectory("graft_ann_flat").toString
    val partDir = java.nio.file.Files.createTempDirectory("graft_ann_part").toString
    idx.assigned.write.mode("overwrite").parquet(s"$flatDir/assigned")
    // cluster each cell into one file before the partitioned write —
    // raw partitionBy splits EVERY task's output by value (tasks × k
    // small files, and the listing cost swamps the pruning win)
    idx.assigned.repartition(col("cid")).write.mode("overwrite")
      .partitionBy("cid").parquet(s"$partDir/assigned")

    // read back with an EXPLICIT schema: directory-name type inference
    // would make the cid partition column INT, and the long cast that
    // repairs it wraps the join key — which blocks the DPP rule from
    // recognizing the partition-column equi-join. A user schema keeps
    // cid long natively, so both layouts run the identical plan above
    // the scan and the partitioned one is DPP-eligible.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("d2",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType)))
    def loadAssigned(dir: String): DataFrame =
      spark.read.schema(schema).parquet(s"$dir/assigned")
        .select(col("vec_id"), col("v"), col("cid"), col("d2"))
    val probes = idx.assigned
      .filter(col("vec_id") >= 2000L && col("vec_id") < 2000L + nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .collect()
    val probeDf = {
      import spark.implicits._
      probes.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .toDF("probe_id", "pv")
    }
    val cellsTouched = probeDf
      .select(explode(slice(array_sort(
        graft.sim.Sim.distStructs(col("pv"), idx.centroids)), 1, nprobe)))
      .select(col("col.cid")).distinct().count()

    // the probed cells are knowable DRIVER-side (centroids are
    // literals; ≤ probes·nprobe ≤ k values — the bounded-collect
    // convention): an explicit `cid IN (...)` filter on the scan is
    // STATIC partition pruning — deterministic, no reliance on the
    // DPP rule's selective-filter heuristics (which do NOT fire for a
    // filterless tiny probe relation — measured in this tool's first
    // capture), and semantically a no-op (the equi-join already
    // restricts candidates to probed cells).
    val probedCells = probeDf
      .select(explode(slice(array_sort(
        graft.sim.Sim.distStructs(col("pv"), idx.centroids)), 1, nprobe)))
      .select(col("col.cid")).distinct().collect().map(_.getLong(0)).toSeq

    def searchWall(dir: String, pruneCells: Boolean): (Double, Long, String) = {
      var best = Double.MaxValue
      var rows = 0L
      var plan = ""
      for (_ <- 1 to reps) {
        val assigned0 = loadAssigned(dir)
        val assigned =
          if (pruneCells) assigned0.filter(col("cid").isin(probedCells: _*))
          else assigned0
        val q = graft.sim.Sim.searchIvfProbes(
          graft.sim.Sim.IvfIndex(assigned, idx.centroids), probeDf, nprobe)
        plan = q.queryExecution.executedPlan.toString
        val (n, sec) = time(q.count())
        rows = n
        best = math.min(best, sec)
      }
      (best, rows, plan)
    }

    val (flatSec, flatRows, _) = searchWall(flatDir, pruneCells = false)
    val (partSec, partRows, partPlan) = searchWall(partDir, pruneCells = false)
    val (prunedSec, prunedRows, prunedPlan) = searchWall(partDir, pruneCells = true)
    val dpp = partPlan.contains("dynamicpruning")
    // the pruned variant must show the IN filter INSIDE PartitionFilters
    // (directory-level skip), not just as a row predicate
    val staticPrune = prunedPlan.contains("PartitionFilters: [cid")
    require(flatRows == partRows && partRows == prunedRows,
      s"layout A/B result mismatch: flat $flatRows / part $partRows / pruned $prunedRows")

    val line =
      s"""{"metric":"ann_layout_ab","degraded":${Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","k":$k,"nprobe":$nprobe,""" +
        s""""probes":$nProbes,"cells_touched":$cellsTouched,"reps":$reps,""" +
        s""""dpp_in_plan":$dpp,"static_prune_in_plan":$staticPrune,"rows":$flatRows,""" +
        s""""flat_scan_sec":${num(flatSec)},"partitioned_sec":${num(partSec)},""" +
        s""""partitioned_cell_pruned_sec":${num(prunedSec)},""" +
        s""""speedup_pruned_vs_flat":${num(flatSec / prunedSec)},""" +
        s""""load_avg":${num(Capture.loadAvg())}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
