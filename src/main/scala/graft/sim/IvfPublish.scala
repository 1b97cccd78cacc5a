package graft.sim

import org.apache.spark.sql.functions._

/** Build and PUBLISH an IVF index artifact for a corpus — the
  * disk-published lifecycle's build half, standalone. AnnProbe
  * bundles the same build with a full probe suite; a layout rebuild
  * (e.g. republishing a decade-scale index cid-partitioned for the
  * sparse-batch serving regime) should not pay for probes it does
  * not need.
  *
  * Usage: `IvfPublish <sfDir> <publishDir> [flat|partitioned]`
  *
  * Geometry matches AnnProbe's publish path exactly: adaptive
  * k = semDedupCells(n), bounded-sample Lloyd (max(5000, 50·k) seed
  * rows, 3 iters), full map-side assignment, IvfStore.save's
  * versioned publish.
  *
  * SPARK_GRAFT_IVF_NO_EXCHANGE=1 writes the partitioned layout
  * map-side (IvfStore.save exchange=false: files per cell = input
  * partitions holding it) — the single-host shape when corpus +
  * shuffle spill + staged layout cannot share one local disk.
  * SPARK_GRAFT_IVF_WRITE_PARTS=<n> coalesces the corpus to n input
  * partitions first, bounding that file count.
  */
object IvfPublish {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val partitioned = args.length > 2 && args(2) == "partitioned"
    val exchange = !sys.env.get("SPARK_GRAFT_IVF_NO_EXCHANGE").contains("1")
    val writeParts = sys.env.get("SPARK_GRAFT_IVF_WRITE_PARTS").map(_.toInt)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val e = Sim.vecs(spark, sfDir)
    val n = e.count()
    val k = Sim.semDedupCells(n)
    val trainN = math.max(5000L, 50L * k)
    val t0 = System.nanoTime()
    val cents = Sim.lloyd(e.filter(col("vec_id") < trainN), col("v"), k, 3)
    val src = e.select(col("vec_id"), col("v"))
    val shaped = writeParts.map(src.coalesce).getOrElse(src)
    IvfStore.save(Sim.IvfIndex(Sim.assignTo(shaped, cents), cents), outDir,
      partitioned = partitioned, exchange = exchange)
    val sec = (System.nanoTime() - t0) / 1e9
    val meta = IvfStore.loadMeta(spark, outDir)
    println(
      s"""{"metric":"ivf_publish","sf":"$sfDir","n":$n,"k":$k,""" +
        s""""partitioned":$partitioned,"exchange":$exchange,""" +
        s""""write_parts":${writeParts.getOrElse(-1)},""" +
        s""""sec_build":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))},""" +
        s""""meta_n":${meta.n},"meta_k":${meta.k},"meta_partitioned":${meta.partitioned}}""")
    spark.stop()
  }
}
