package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftQuery
import graft.gfunctions._

/** Optimized Product Quantization (parametric OPQ, Ge et al., CVPR
  * 2013): learn an orthonormal rotation of the residual space BEFORE
  * the PQ subspace split, so the subspaces are decorrelated and carry
  * balanced variance — the same 32-bit code budget buys less
  * quantization error than splitting the raw residual dimensions.
  *
  * The parametric form is the one that fits a distributed engine:
  *  1. covariance of the IVF residuals — ONE distributed pass
  *     (posexplode² → groupBy (i,j), decimal-exact sums so the matrix
  *     is independent of partition order), d(d+1)/2 + d cells shuffled
  *     with map-side partial aggregation: bytes, not data;
  *  2. eigendecomposition of the d×d matrix on the DRIVER — d=64, a
  *     4096-double problem, the same bounded-collect class as the
  *     Lloyd codebooks (cyclic Jacobi, StrictMath throughout, so the
  *     result is bit-reproducible across hosts);
  *  3. eigenvalue allocation: principal directions distributed over
  *     the PqM subspaces balancing the per-subspace log-variance
  *     product (LPT greedy over |log λ|, deterministic tie-breaks) —
  *     the paper's balanced-information criterion;
  *  4. the rotation rides back into the plan as a literal matrix:
  *     rotating a vector is `transform`(rows) × native dot-product —
  *     map-side, codegen-friendly, d² multiplies per row (the known
  *     OPQ encode cost), zero shuffles.
  *
  * s_opq_adc is then s_ivf_adc_residual with rotated residuals on
  * both the corpus (coding) side and the probe (per-cell ADC table)
  * side; the exact-cosine re-rank stays in the RAW space.
  *
  * Correctness: declared rows-only (`no_oracle`), like the two sketch
  * operators — the driver-side eigensolve has no DuckDB replay (SQL
  * has no eigendecomposition), so instead of a weakened given-R
  * oracle the contract is pinned by OpqSpec: R orthonormality and
  * isometry at 1e-9, the eigen-equation residual ‖Σu − λu‖ against
  * the distributed covariance, allocation balance vs the naive
  * contiguous split, and the recall-vs-memory curve (IvfRecallSpec)
  * showing OPQ ≥ plain-residual ADC at every code budget.
  */
object Opq {

  private val Dim = Sim.PqM * Sim.PqSubLen

  /** Covariance matrix of the `r` array column — one distributed
    * pass, decimal-exact (order-independent) sums, d(d+1)/2 upper
    * cells + d means collected (bounded: ~2k rows at d=64).
    */
  private[graft] def covariance(res: DataFrame): Array[Array[Double]] = {
    val moments = res
      .select(posexplode(col("r")).as(Seq("i", "xi")), col("r"))
      .select(col("i"), col("xi"), posexplode(col("r")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast(DecimalType(28, 14))).cast("double").as("sxx"),
        count(lit(1)).as("n"))
      .collect()
    val means = res
      .select(posexplode(col("r")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast(DecimalType(28, 14))).cast("double").as("sx"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1) / r.getLong(2)).toMap
    val s = Array.ofDim[Double](Dim, Dim)
    moments.foreach { row =>
      val (i, j) = (row.getInt(0), row.getInt(1))
      val e2 = row.getDouble(2) / row.getLong(3)
      val c = e2 - means(i) * means(j)
      s(i)(j) = c
      s(j)(i) = c
    }
    s
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, StrictMath transcendentals, so
    * identical on every host), returns (eigenvalues, eigenvector
    * columns) sorted by (λ desc, original index), each vector
    * sign-fixed so its largest-|component| entry is positive.
    */
  private[graft] def jacobiEigen(s0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = s0.length
    val a = s0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var t = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { t += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      t
    }
    var sweep = 0
    while (off() > 1e-22 && sweep < 100) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          if (StrictMath.abs(a(p)(q)) > 1e-300) {
            val theta = 0.5 * StrictMath.atan2(2.0 * a(p)(q), a(q)(q) - a(p)(p))
            val c = StrictMath.cos(theta)
            val s = StrictMath.sin(theta)
            var i = 0
            while (i < n) { // columns p,q of a
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) { // rows p,q of a
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) { // accumulate eigenvectors (columns of v)
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val w = order.map(i => a(i)(i)).toArray
    val u = order.map { k =>
      val colK = Array.tabulate(n)(i => v(i)(k))
      val pivot = colK.indices.maxBy(i => (StrictMath.abs(colK(i)), -i))
      if (colK(pivot) < 0) colK.map(x => -x) else colK
    }.toArray
    (w, u)
  }

  /** Eigenvalue allocation (the paper's balanced-information split):
    * LPT greedy — process directions by |log λ| descending, give each
    * to the capacity-free subspace whose log-variance product is
    * largest (all logs share a sign at either scale, so that is the
    * least-loaded bin). Deterministic tie-breaks; indices inside a
    * subspace stay in eigenvalue order.
    */
  private[graft] def allocate(w: Array[Double], m: Int, cap: Int): Seq[Seq[Int]] = {
    val items = w.indices.sortBy(i => (-StrictMath.abs(StrictMath.log(math.max(w(i), 1e-300))), i))
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logp = Array.fill(m)(0.0)
    items.foreach { i =>
      val cand = (0 until m).filter(b => buckets(b).size < cap)
      val b = cand.maxBy(b => (logp(b), -b))
      buckets(b) += i
      logp(b) += StrictMath.log(math.max(w(i), 1e-300))
    }
    buckets.map(_.sorted.toSeq).toSeq
  }

  /** The learned rotation as row vectors: row r of R is the
    * eigenvector assigned to output dimension r (subspace-major), so
    * rotated(x) = R·x groups balanced principal directions into
    * contiguous PqSubLen slices.
    */
  private[graft] def learnRotation(res: DataFrame): Seq[Seq[Double]] = {
    val s = covariance(res)
    val (w, u) = jacobiEigen(s)
    val perm = allocate(w, Sim.PqM, Sim.PqSubLen).flatten
    perm.map(k => u(k).toSeq)
  }

  /** R·x as a literal-matrix map-side expression: `transform` over the
    * row literals × the native dot-product kernel — the same
    * loop-not-unroll shape as distStructs (constant expression size
    * whatever d is).
    */
  private[graft] def rotateExpr(rows: Seq[Seq[Double]], v: Column): Column =
    transform(typedLit(rows), row => dotProduct(row, v))

  /** OPQ index artifacts for (dir, k): the rotation, the per-subspace
    * codebooks trained on ROTATED residuals, and the coded corpus.
    * Memoized with the same session-validity + teardown lifecycle as
    * the Sim memos.
    */
  final case class OpqIndex(rot: Seq[Seq[Double]],
                            books: Seq[Seq[(Long, Seq[Double])]], coded: DataFrame)

  /** The IVF residual frame (vec_id, cid, r = v − centroid(cid)) —
    * the input OPQ learns on; also the spec's entry point for checking
    * the eigensolve against the distributed covariance.
    */
  private[graft] def residualFrame(s: SparkSession, d: String): DataFrame = {
    val idx = Sim.ivfIndex(s, d, k = 8, iters = 3)
    idx.assigned.select(col("vec_id"), col("cid"),
      Sim.residual(col("v"), col("cid"), idx.centroids).as("r"))
  }

  private val opqMemo =
    scala.collection.mutable.Map[(String, Int, Boolean), (SparkSession, OpqIndex)]()
  graft.Caching.onReleaseAll(() => opqMemo.synchronized(opqMemo.clear()))

  /** Artifacts at code budget k, with (`rotate` = true) or without the
    * learned rotation — the un-rotated variant is the curve baseline:
    * the identical pipeline at the identical budget, isolating the
    * rotation's contribution (rot is empty there, and the residual
    * frame feeds the codebooks directly).
    */
  def opqArtifacts(s: SparkSession, d: String, k: Int,
                   rotate: Boolean = true): OpqIndex =
    opqMemo.synchronized {
      opqMemo.get((d, k, rotate)) match {
        case Some((sess, art)) if (sess eq s) && !s.sparkContext.isStopped => art
        case _ =>
          val resDF = residualFrame(s, d)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // rotation + codebooks learn on the bounded training sample
          // (Sim.PqTrainCap, the Faiss convention) — the covariance
          // pass explodes d(d+1)/2 cells per vector and Lloyd is
          // O(n·k), so neither may scan the full corpus; the rotation
          // APPLICATION and coding below stay full passes
          // spread: the sample sits in 1-2 scan partitions otherwise,
          // running the covariance + Lloyd passes nearly serially
          val trainDF = Sim.spread(resDF.filter(col("vec_id") < Sim.PqTrainCap))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val rot = if (rotate) learnRotation(trainDF) else Seq.empty
          // the rotated frame MUST be a materialization boundary:
          // without it CollapseProject inlines the d² rotation into
          // every centroid-distance lambda of the Lloyd loops and the
          // coding pass, recomputing it k×3 times per row (measured
          // ~10× on this operator).
          val rotDF = if (rotate)
            resDF.select(col("vec_id"), col("cid"), rotateExpr(rot, col("r")).as("r"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else resDF
          val rotTrain = Sim.spread(rotDF.filter(col("vec_id") < Sim.PqTrainCap))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val books = (0 until Sim.PqM).map(j =>
            Sim.lloyd(rotTrain,
              slice(col("r"), j * Sim.PqSubLen + 1, Sim.PqSubLen),
              k, Sim.PqIters))
          rotTrain.unpersist(blocking = false)
          trainDF.unpersist(blocking = false)
          val coded = graft.Caching.releaseAfter(
            rotDF.select(
              Seq(col("vec_id").as("neighbor_id"), col("cid")) ++
                (0 until Sim.PqM).map { j =>
                  val rsub = slice(col("r"), j * Sim.PqSubLen + 1, Sim.PqSubLen)
                  argminCentroid(rsub, books(j)).getField("cid").as(s"rcode$j")
                }: _*),
            (if (rotate) Seq(rotDF, resDF) else Seq(resDF)): _*)
          val art = OpqIndex(rot, books, graft.Caching.retain(coded))
          opqMemo((d, k, rotate)) = (s, art)
          art
      }
    }

  /** The routed ADC search over rotated residuals — identical pipeline
    * to s_ivf_adc_residual (route → per-cell ADC tables → equi-join
    * candidate scan → shortlist → exact-cosine re-rank on RAW vectors),
    * with the probe's per-cell residual rotated by the same R before
    * its tables are built.
    */
  def searchOpq(s: SparkSession, d: String, k: Int,
                rotate: Boolean = true): DataFrame = {
    val idx = Sim.ivfIndex(s, d, k = 8, iters = 3)
    val art = opqArtifacts(s, d, k, rotate)
    val e = Sim.vecs(s, d).select(col("vec_id"), col("v"))
    // single home for the probe-set convention — the re-rank's pv
    // re-attach joins this same frame (see s_ivf_adc_residual)
    val probeFrame = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val routed = probeFrame
      .select(col("probe_id"), col("pv"),
        explode(slice(array_sort(Sim.distStructs(col("pv"), idx.centroids)), 1, 2))
          .as("_pc"))
      .select(col("probe_id"), col("pv"), col("_pc.cid").as("cid"))
    val rawRes = Sim.residual(col("pv"), col("cid"), idx.centroids)
    val pr = if (rotate) rotateExpr(art.rot, rawRes) else rawRes
    // materialize the per-cell ROTATED probe residual before the ADC
    // tables reference it: the table builder evaluates its input k×3
    // times inside interpreted HOF lambdas, and without this boundary
    // CollapseProject re-inlines the d² rotation into every one of
    // them (measured ~15× on this probe stage). Probe-cell rows are
    // the tiny side, so the extra checkpoint is bytes.
    val routedRot = graft.Caching.releaseAfter(
      routed.select(col("probe_id"), col("pv"), col("cid"), pr.as("prr")))
    val dtabs = (0 until Sim.PqM).map(j =>
      Sim.adcTable(slice(col("prr"), j * Sim.PqSubLen + 1, Sim.PqSubLen), art.books(j))
        .as(s"dtab$j"))
    val probes = graft.Caching.releaseAfter(
      routedRot.select(Seq(col("probe_id"), col("pv"), col("cid")) ++ dtabs: _*))
    val adist = (0 until Sim.PqM)
      .map(j => element_at(col(s"dtab$j"), col(s"rcode$j"))).reduce(_ + _)
    // candidate-scaled re-rank cut, same contract as searchIvfAdc
    val cand = 2L * Sim.corpusCount(s, d) / math.max(idx.centroids.size, 1)
    val shortlistN = Sim.adcShortlist(cand)
    val wA = Window.partitionBy("probe_id").orderBy(col("adist"), col("neighbor_id"))
    val shortlist = broadcast(probes)
      .join(art.coded, Seq("cid"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), adist.as("adist"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= shortlistN)
      .select(col("probe_id"), col("neighbor_id"))
    val wX = Window.partitionBy("probe_id").orderBy(col("cs").desc, col("neighbor_id"))
    // slim-shortlist re-rank (see Sim.searchIvfAdcProbes): probe vector
    // re-attaches from the bounded probe frame, hint only at gates
    val fetch =
      if (shortlistN <= Sim.AdcShortlist) broadcast(shortlist) else shortlist
    fetch
      .join(e.select(col("vec_id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
      .join(broadcast(probeFrame), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"), cosine(col("pv"), col("v")).as("cs"))
      .withColumn("rank", row_number().over(wX))
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("neighbor_id"), col("rank"),
        round(col("cs"), 4).as("cos_sim"))
      .orderBy("probe_id", "rank")
  }

  /** s_opq_adc: the OPQ-rotated residual IVFADC at the production
    * k=256 code budget. Rows-only by declaration (see the object
    * scaladoc for why there is no SQL oracle and which spec pins it).
    */
  val opqAdc = GraftQuery(
    "s_opq_adc",
    None,
    (s, d) => searchOpq(s, d, Sim.PqK),
  )
}
