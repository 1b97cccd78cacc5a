package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Online-index staleness probe — `AddProbe <sfDir> <regime> [outFile]`
  * (VERDICT r11, Next #3).
  *
  * IvfStoreSpec proves `IvfStore.add` ≡ one-shot assignment, but the
  * centroids are never retrained — and st_ann serves from this index
  * while a production ingest pipeline appends forever. The open
  * question: after appending 2×/5×/10× the trained corpus, how far
  * does routed-search recall@3 fall behind a fresh-trained index, and
  * what statistic (that the store already computes at add time)
  * predicts the divergence well enough to be the retrain trigger?
  *
  * Two append regimes, same hash-vector scheme as GenScale's
  * `vectors` mode (clustered: v = √0.75·ĉ + 0.5·r̂, normalized):
  *   - `same`  — appends drawn around the SAME 256 cluster directions
  *     the base corpus (and therefore the trained quantizer) uses:
  *     the distribution-stationary control, where no-retrain append is
  *     the textbook-correct operation.
  *   - `drift` — appends drawn around 256 NEW hash directions the
  *     quantizer never saw: the honest case (domain shift, new data
  *     sources), where stale centroids must absorb foreign clusters
  *     into whatever cells happen to be nearest.
  *
  * Per append level f ∈ {2,5,10} (factors of the base corpus):
  *   - stale index  = IvfStore.add(trained, appended) — centroids
  *     frozen, k = semDedupCells(n_base).
  *   - fresh index  = IvfStore.retrain at the CURRENT size (k =
  *     semDedupCells(f·n), Lloyd on a union-wide hash-stride sample —
  *     a vec_id-prefix sample would train on base rows only and
  *     rebuild the stale index under a new name).
  *   - recall@3 vs brute force over the union, for TWO probe
  *     populations: base-distribution probes (the r9 probe-id
  *     convention) and appended-distribution probes — staleness hurts
  *     exactly where the data is new.
  *   - trigger statistics, both computable incrementally at add time:
  *     appended_frac, and d2_ratio = mean assign distance of the
  *     appended rows under the FROZEN centroids / mean assign
  *     distance of the trained corpus (a quantizer that represents
  *     the new data reads ~1.0; foreign clusters read ≫ 1), plus the
  *     stale index's cell max/avg imbalance.
  *
  * nprobe rides each index's own k (√k, the AnnProbe rule), so stale
  * and fresh are each searched at their deployed configuration.
  */
object AddProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Clustered unit vectors for ids [lo, hi) — same mixing law and
    * integer-lattice hash draw as GenScale.scaleEmbeddings, with the
    * cluster-direction salt as the regime knob ("center" replays the
    * base corpus' 256 directions; any other salt is a disjoint set).
    */
  private def genVecs(s: SparkSession, lo: Long, hi: Long,
                      centerSalt: String): DataFrame = {
    val raw = transform(sequence(lit(0), lit(63)), i =>
      (pmod(xxhash64(col("vec_id"), lit(999), i), lit(2001L)).cast("double")
        - 1000.0) / 1000.0)
    val cid = pmod(xxhash64(col("vec_id"), lit(999), lit("cluster")), lit(256L))
    val centerVec = transform(sequence(lit(0), lit(63)), i =>
      (pmod(xxhash64(cid, i, lit(centerSalt)), lit(2001L)).cast("double")
        - 1000.0) / 1000.0)
    val cn = sqrt(aggregate(centerVec, lit(0.0), (a, x) => a + x * x))
    val rn = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    val mixed = zip_with(centerVec, raw,
      (c, r) => lit(math.sqrt(0.75)) * c / cn + lit(0.5) * r / rn)
    s.range(lo, hi).select(col("id").as("vec_id"))
      .repartition(64)
      .withColumn("_raw", mixed)
      .withColumn("_nrm", sqrt(aggregate(col("_raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"), transform(col("_raw"), x => x / col("_nrm")).as("v"))
  }

  private def bruteTop3(probes: DataFrame, ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cs").desc, col("neighbor_id"))
    broadcast(probes)
      .join(ev.select(col("vec_id").as("neighbor_id"), col("v")),
        col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.gfunctions.cosine(col("pv"), col("v")).as("cs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
  }

  private def recallOf(found: DataFrame, brute: DataFrame, denom: Double): Double =
    found.select(col("probe_id"), col("neighbor_id"))
      .join(brute, Seq("probe_id", "neighbor_id")).count() / denom

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val regime = args(1) // same | drift
    val outFile = if (args.length > 2) Some(args(2)) else None
    require(Seq("same", "drift").contains(regime),
      s"regime must be same|drift, got $regime")
    val centerSalt = if (regime == "same") "center" else "center_drift"
    val factors = sys.env.get("SPARK_GRAFT_ADD_FACTORS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(2, 5, 10))
    val recallProbes =
      sys.env.get("SPARK_GRAFT_ADD_RECALL_PROBES").map(_.toInt).getOrElse(100)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    val loadStart = graft.tools.Capture.loadAvg()

    val e = Sim.vecs(spark, sfDir)
    val n = e.count()
    val idx0 = Sim.ivfIndexAdaptive(spark, sfDir, iters = 3)
    val kStale = idx0.centroids.size
    val nprobeStale = math.max(2, math.round(math.sqrt(kStale)).toInt)
    // the SAME baselines IvfStore.save persists in meta/ — so each
    // level's retrain_due below is exactly the serving-side rule
    // (IvfStore.retrainDue over loadMeta) evaluated on measured drift
    val meta = IvfStore.computeMeta(idx0.assigned, kStale)
    val d2Base = meta.d2Base
    // base-distribution probes: the AnnProbe convention (replica-1
    // ids — vectors drawn from the scaled clustered regime)
    val probesBase = idx0.assigned
      .filter(col("vec_id") >= 2000L && col("vec_id") < 2000L + recallProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probesBase.count()

    val levels = factors.map { f =>
      val total = f.toLong * n
      val appends = genVecs(spark, n, total, centerSalt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      appends.count()
      val ev = e.select(col("vec_id"), col("v")).unionByName(appends)

      // STALE: the API under test — frozen centroids absorb the batch;
      // d2_ratio is the library's own trigger statistic
      val stale = IvfStore.add(idx0, appends)
      val staleAssigned = stale.assigned
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val d2Ratio = IvfStore.batchD2Ratio(idx0, appends, d2Base)
      val cellStats = staleAssigned.groupBy("cid").count()
        .agg(max("count").cast("double").as("mx"), avg("count").as("av")).head()
      val imbalance = cellStats.getDouble(0) / cellStats.getDouble(1)

      // FRESH: the library's retrain path (union-wide hash sample,
      // re-keyed for Lloyd's seed convention, k at the current size)
      val (fresh0, secFresh) = time {
        val f0 = IvfStore.retrain(ev)
        f0.assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        f0
      }
      val fresh = fresh0
      val kFresh = fresh.centroids.size
      val nprobeFresh = math.max(2, math.round(math.sqrt(kFresh)).toInt)

      // appended-distribution probes: the tail of THIS level's batch
      val probesNew = appends.filter(col("vec_id") >= total - recallProbes)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      probesNew.count()

      val bruteB = bruteTop3(probesBase, ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bruteN = bruteTop3(probesNew, ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val denomB = bruteB.count().toDouble
      val denomN = bruteN.count().toDouble
      if (denomB == 0 || denomN == 0)
        sys.error(s"AddProbe: empty brute-force baseline at factor $f " +
          s"(base=$denomB appended=$denomN) — degenerate corpus, refusing to emit")

      val rStaleB = recallOf(Sim.searchIvfProbes(stale, probesBase, nprobeStale), bruteB, denomB)
      val rStaleN = recallOf(Sim.searchIvfProbes(stale, probesNew, nprobeStale), bruteN, denomN)
      val rFreshB = recallOf(Sim.searchIvfProbes(fresh, probesBase, nprobeFresh), bruteB, denomB)
      val rFreshN = recallOf(Sim.searchIvfProbes(fresh, probesNew, nprobeFresh), bruteN, denomN)

      val lvl =
        s"""{"factor":$f,"n_total":$total,"appended_frac":${num((total - n).toDouble / total)},""" +
          s""""d2_ratio":${num(d2Ratio)},"cell_max_over_avg":${num(imbalance)},""" +
          s""""retrain_due":${IvfStore.retrainDue(d2Ratio, imbalance, meta)},""" +
          s""""k_fresh":$kFresh,"nprobe_fresh":$nprobeFresh,"sec_fresh_build":${num(secFresh)},""" +
          s""""recall_stale_base":${num(rStaleB)},"recall_stale_new":${num(rStaleN)},""" +
          s""""recall_fresh_base":${num(rFreshB)},"recall_fresh_new":${num(rFreshN)}}"""
      Seq(appends, staleAssigned, fresh.assigned, probesNew, bruteB, bruteN)
        .foreach(_.unpersist(blocking = false))
      lvl
    }

    val loadAvg = graft.tools.Capture.loadAvg()
    val line =
      s"""{"metric":"add_probe","degraded":${graft.tools.Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","regime":"$regime",""" +
        s""""n_base":$n,"k_stale":$kStale,"nprobe_stale":$nprobeStale,""" +
        s""""recall_probes":$recallProbes,"d2_base":${num(d2Base)},""" +
        s""""imbalance_base":${num(meta.imbalance)},"rule":"retrain_due = d2_ratio >= ${IvfStore.D2RatioTrigger} or cell_max_over_avg >= ${IvfStore.ImbalanceDoubling}x save-time imbalance (IvfStore.retrainDue over the persisted meta baselines)",""" +
        s""""levels":[${levels.mkString(",")}],"load_avg":${num(loadAvg)}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
