package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN routed-scan regime probe — `AnnProbe <sfDir> [outFile]`.
  *
  * The r9 ANN exponents (0.07–0.29 at 20k→200k vectors) measured
  * FIXED OVERHEAD: at those corpus sizes every phase finishes under
  * ~2 s, so the term the 100 TB ANN claim actually rests on — the
  * per-probe routed scan of nprobe·n/k candidates — had never been
  * exercised. This tool drives the adaptive-k index
  * (k = semDedupCells(n) ≈ √(n/50), the same rule d_semantic_dedup
  * ships) over multi-million-vector `vectors`-mode corpora
  * (tools/GenScale) with a probe BATCH large enough that the routed
  * scan dominates: candidates examined per run ≈
  * nProbes · nprobe · n/k ≈ nProbes · 2·√(50n).
  *
  * Phases measured separately (each is a different scale claim):
  *   - build: Lloyd train (bounded at ≥50 vec/cell) + full-corpus
  *     map-side assignment + index materialization — Θ(n·k) work.
  *   - search: cell-routed exact-cosine top-3 for the probe batch —
  *     the nprobe·n/k term, Θ(nProbes·√n) at the adaptive k.
  *   - filtered: same routing with the label pre-filter join.
  *   - encode+adc: PQ-code the corpus under the SAME index, then the
  *     ADC-scan + shortlist re-rank composition (s_ivf_adc's shape).
  *   - brute (on a recall subset): the exact baseline, Θ(R·n).
  * Recall@3 for routed and ADC search is computed against brute on
  * the same subset — the number that licenses the nprobe=2 knob at
  * the new k.
  *
  * Probe vectors are vec_id < nProbes of replica 0, i.e. the SAME
  * source vectors at every scale factor, so cross-scale wall-clock
  * ratios measure corpus growth only.
  */
object AnnProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def minOf(runs: Int)(body: => Long): Double =
    (1 to runs).map(_ => time(body)._2).min

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Exact brute-force top-3 per probe WITHOUT shuffling the
    * candidate volume: the window form (row_number over partitionBy
    * probe_id) sort-exchanges recallProbes·n rows — 5·10⁹ rows
    * (~100+ GB of spill) at 100M vectors, which is what killed the
    * first r15 100M run on disk. Candidates never need to move: each
    * scan partition keeps a bounded best-3 per probe
    * (≤ recallProbes·3 tuples of state), and the global merge
    * aggregates ≤ partitions·probes·3 rows. Ordering
    * (cs DESC, neighbor_id ASC) matches the window's row_number
    * ordering exactly, so the selected set is identical
    * (window-equivalence pinned in AnnBruteTopKSpec).
    *
    * Undefined cosines are EXCLUDED before either stage: a zero-norm
    * corpus vector yields NULL cs (gfunctions.cosine's safeDiv),
    * which would NPE the keeper's getDouble, and a NaN (non-finite
    * vector entries) sorts inconsistently across the three orderings
    * in play — the keeper's `<` drops it, the merge's negated
    * sort_array puts it last, and the raw window form ranks it FIRST
    * (Spark orders NaN greatest in a DESC sort). A recall denominator
    * must never contain an undefined similarity; AnnBruteTopKSpec
    * pins equivalence to the filtered window form.
    */
  private[graft] def bruteTop3(probesR: DataFrame, ev: DataFrame): DataFrame = {
    val cand = broadcast(probesR)
      .join(ev.select(col("vec_id").as("neighbor_id"), col("v")),
        col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.gfunctions.cosine(col("pv"), col("v")).as("cs"))
      .filter(col("cs").isNotNull && !isnan(col("cs")))
    val partialSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("probe_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cs",
        org.apache.spark.sql.types.DoubleType)))
    val partial = cand.mapPartitions { it =>
      val best = scala.collection.mutable.Map[Long,
        scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
      def worse(a: (Long, Double), b: (Long, Double)): Boolean =
        a._2 < b._2 || (a._2 == b._2 && a._1 > b._1)
      for (r <- it) {
        val p = r.getLong(0); val nb = r.getLong(1); val c = r.getDouble(2)
        val buf = best.getOrElseUpdate(p,
          new scala.collection.mutable.ArrayBuffer[(Long, Double)](4))
        if (buf.size < 3) buf += ((nb, c))
        else {
          var wi = 0
          var i = 1
          while (i < 3) { if (worse(buf(i), buf(wi))) wi = i; i += 1 }
          if (worse(buf(wi), (nb, c))) buf(wi) = ((nb, c))
        }
      }
      best.iterator.flatMap { case (p, buf) =>
        buf.iterator.map { case (nb, c) => org.apache.spark.sql.Row(p, nb, c) }
      }
    }(org.apache.spark.sql.Encoders.row(partialSchema))
    partial
      // negated cs: sort_array's ascending struct order then IS
      // (cs DESC, neighbor_id ASC) — row_number's ordering
      .groupBy("probe_id")
      .agg(slice(sort_array(collect_list(struct((-col("cs")).as("ncs"),
        col("neighbor_id")))), 1, 3).as("top"))
      .select(col("probe_id"), explode(col("top")).as("t"))
      .select(col("probe_id"), col("t.neighbor_id").as("neighbor_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) Some(args(1)) else None
    val nProbes = sys.env.get("SPARK_GRAFT_ANN_PROBES").map(_.toInt).getOrElse(1000)
    val recallProbes =
      sys.env.get("SPARK_GRAFT_ANN_RECALL_PROBES").map(_.toInt).getOrElse(100)
    val runs = sys.env.get("SPARK_GRAFT_ANN_RUNS").map(_.toInt).getOrElse(2)
    val nprobeEnv = sys.env.get("SPARK_GRAFT_ANN_NPROBE").map(_.toInt)
    // probe ids default to [2000, 2000+nProbes): replica 1 of an
    // sf0.1-derived corpus — vectors DRAWN FROM the scaled regime
    // (clustered in `vectors` mode), bit-identical across scale
    // factors. Base 0 would probe the 2000 verbatim source vectors,
    // which in clustered corpora sit outside every cluster.
    val pBase = sys.env.get("SPARK_GRAFT_ANN_PROBE_BASE").map(_.toLong).getOrElse(2000L)
    val shortlistEnv = sys.env.get("SPARK_GRAFT_ANN_SHORTLIST").map(_.toInt)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.local(cpus)
    // sample load BEFORE any measured work: the probe's own executors
    // drive the 1-min average — end-of-run load measures the tool, not
    // the host contention the degraded flag exists to expose
    val loadStart = graft.tools.Capture.loadAvg()

    val e = Sim.vecs(spark, sfDir)
    val n = e.count()
    val k = Sim.semDedupCells(n)
    // nprobe must ride with k: the fixed nprobe=2 of the k=8 gate
    // scans 25% of the corpus, but at adaptive k a constant nprobe
    // scans 2/k — recall on an unclustered corpus collapses with it.
    // nprobe ≈ √k (the published FAISS sizing guidance for
    // nprobe-vs-nlist) keeps the scanned fraction √k/k = 1/√k while
    // candidates per probe grow only as √(n·cell) — the measured
    // recall below is the price tag of exactly this choice.
    val nprobe = nprobeEnv.getOrElse(math.max(2, math.round(math.sqrt(k)).toInt))
    // The ADC shortlist must ride the candidate volume: at the fixed
    // product constant (50) recall@3 collapsed 0.20 -> 0.02 as
    // candidates/probe grew 25k -> 285k — PQ distance error exceeds
    // the gap between rank-50 and the true top-3 long before that.
    // Since r11 the rule (cand/12, floored at 50 — divisor from the
    // measured recall-vs-shortlist sweep) ships in the
    // REGISTERED operators (Sim.adcShortlist) and the probe resolves
    // it from there, so this artifact measures the production
    // configuration, not a tool-local reimplementation.
    val shortlist = shortlistEnv.getOrElse(
      Sim.adcShortlist(nprobe.toLong * n / math.max(k, 1)))
    // self-describing artifact (VERDICT r11 #4): record WHICH rule
    // produced `shortlist`, so a reader of this JSON alone can tell a
    // fixed-override capture from the registered operator rule
    val shortlistRule = shortlistEnv
      .map(v => s"env_fixed_$v")
      .getOrElse {
        val cand = nprobe.toLong * n / math.max(k, 1)
        s"max(50,cand/${Sim.adcShortlistDivisor(cand)})"
      }

    // BUILD — the one unrepeatable phase: train + assign + materialize.
    // Default: the in-session memoized index (cache blocks), forced
    // through the row count. SPARK_GRAFT_ANN_PUBLISH_DIR=<dir>: the
    // DISK-PUBLISHED lifecycle instead — bounded-sample Lloyd, full
    // map-side assignment written straight through IvfStore.save's
    // versioned publish, then served from the artifact. At >=10^8
    // vectors this is the only shape that fits a single host (the
    // cached assigned corpus alone is ~2x the corpus bytes), and it is
    // the truer production claim: build once, serve from storage.
    val publishDir = sys.env.get("SPARK_GRAFT_ANN_PUBLISH_DIR")
    // a PUBLISH_DIR that already holds a published version is REUSED
    // (build once, serve from storage — the lifecycle's whole point;
    // a probe retry must not pay the ~30 min / 1.5x-corpus-bytes
    // rebuild). sec_build then measures the artifact BOOT and the
    // JSON says so via build_reused. SPARK_GRAFT_ANN_REBUILD=1 forces
    // the full rebuild.
    var buildReused = false
    val (idx, secBuild) = time {
      publishDir match {
        case Some(dir)
          if IvfStore.currentVersion(spark, dir) >= 0 &&
            !sys.env.get("SPARK_GRAFT_ANN_REBUILD").contains("1") =>
          // the published artifact must BE an index of THIS corpus at
          // THIS geometry: a stale dir (different scale or k) would
          // route probes through the wrong cells while recall and ADC
          // run over the current corpus — silently wrong recall with
          // only build_reused as a hint. Meta is a 1-row read.
          val meta = IvfStore.loadMeta(spark, dir)
          require(meta.n == n && meta.k == k,
            s"AnnProbe: published index at $dir has n=${meta.n}, k=${meta.k} " +
              s"but the current corpus computes n=$n, k=$k — rm -rf the dir " +
              "or set SPARK_GRAFT_ANN_REBUILD=1 to rebuild for this corpus")
          buildReused = true
          IvfStore.load(spark, dir)
        case Some(dir) =>
          val trainN = math.max(5000L, 50L * k)
          val cents = Sim.lloyd(e.filter(col("vec_id") < trainN), col("v"), k, 3)
          IvfStore.save(
            Sim.IvfIndex(Sim.assignTo(e.select(col("vec_id"), col("v")), cents),
              cents), dir)
          IvfStore.load(spark, dir)
        case None =>
          val i = Sim.ivfIndexAdaptive(spark, sfDir, iters = 3)
          i.assigned.count()
          i
      }
    }
    val probes = idx.assigned
      .filter(col("vec_id") >= pBase && col("vec_id") < pBase + nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pCount = probes.count()

    val secSearch = minOf(runs)(Sim.searchIvfProbes(idx, probes, nprobe).count())
    val labels = e.select(col("vec_id"), col("label"))
    val secFiltered =
      minOf(runs)(Sim.searchIvfProbesFiltered(idx, labels, probes, nprobe).count())

    // PQ path under the SAME adaptive-k index: code the corpus once
    // (stored-index lifecycle), then ADC-scan the probe batch.
    val (books, secBooks) = time(Sim.pqBooks(spark, sfDir))
    val (coded, secEncode) = time {
      val c = graft.Caching.releaseAfter(Sim.encodePq(idx.assigned, books))
      c.count()
      c
    }
    val ev = e.select(col("vec_id"), col("v"))
    // refine-from-storage deploy rule (see searchIvfAdcProbes): the
    // slim shortlist is nProbes×shortlist×16 B raw — when that bound
    // is driver-sized, broadcast it so the corpus-with-vectors side
    // never exchanges (AQE's sort-merge choice moved the full 52 GB
    // index for a 230 MB shortlist at 100M and died on local disk).
    // The bound is on RAW bytes but the broadcast materializes as a
    // HashedRelation at several× that (~40+ B/row for two longs plus
    // hash structures), so the cutoff is 256 MB raw ≈ 1–1.5 GB
    // in-memory per executor — not 1 GB raw, which near the bound
    // would force a multi-GB relation where sort-merge belongs.
    // SPARK_GRAFT_ANN_FETCH_BC=1/0 overrides for probe geometries the
    // caller knows better (local mode holds ONE copy of the relation,
    // so a shortlist-sweep point just past the rule's cutoff can
    // still broadcast); the JSON records which path ran.
    val fetchBc = sys.env.get("SPARK_GRAFT_ANN_FETCH_BC").map(_ == "1")
      .getOrElse(nProbes.toLong * shortlist * 16 <= (256L << 20))
    val secAdc =
      minOf(runs)(
        Sim.searchIvfAdcProbes(ev, probes, idx.centroids, books, coded, nprobe,
          shortlist, fetchByBroadcast = fetchBc).count())

    // RECALL vs brute force on the first `recallProbes` probes.
    val probesR = probes.filter(col("probe_id") < pBase + recallProbes)
    val (brute, secBrute) = time {
      val b = graft.Caching.releaseAfter(bruteTop3(probesR, ev))
      b.count()
      b
    }
    def recallOf(found: DataFrame): Double = {
      val denom = brute.count().toDouble
      if (denom == 0) 1.0
      else found.select(col("probe_id"), col("neighbor_id"))
        .join(brute, Seq("probe_id", "neighbor_id")).count() / denom
    }
    val recallIvf = recallOf(Sim.searchIvfProbes(idx, probesR, nprobe))
    val recallAdc =
      recallOf(Sim.searchIvfAdcProbes(ev, probesR, idx.centroids, books, coded,
        nprobe, shortlist, fetchByBroadcast = fetchBc))

    val loadAvg = graft.tools.Capture.loadAvg()
    val line =
      s"""{"metric":"ann_probe","degraded":${graft.tools.Capture.degraded(loadStart)},""" +
        s""""load_avg_start":${num(loadStart)},"sf":"$sfDir","n":$n,"k":$k,""" +
        s""""cell_avg":${n / math.max(k, 1)},"nprobe":$nprobe,"n_probes":$pCount,""" +
        s""""cand_per_probe":${nprobe.toLong * n / math.max(k, 1)},""" +
        s""""scan_frac":${num(nprobe.toDouble / k)},"shortlist":$shortlist,""" +
        s""""shortlist_rule":"$shortlistRule",""" +
        s""""probe_base":$pBase,"runs":$runs,""" +
        s""""sec_build":${num(secBuild)},"build_reused":$buildReused,""" +
        s""""sec_search":${num(secSearch)},""" +
        s""""ms_per_probe":${num(secSearch * 1000 / math.max(pCount, 1))},""" +
        s""""sec_filtered":${num(secFiltered)},"sec_books":${num(secBooks)},""" +
        s""""sec_encode":${num(secEncode)},"sec_adc":${num(secAdc)},""" +
        s""""fetch_broadcast":$fetchBc,""" +
        s""""recall_probes":$recallProbes,"sec_brute":${num(secBrute)},""" +
        s""""recall_ivf_at3":${num(recallIvf)},"recall_adc_at3":${num(recallAdc)},""" +
        s""""load_avg":${num(loadAvg)}}"""
    outFile.foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    println(line)
    spark.stop()
  }
}
