package graft

import org.apache.spark.sql.functions._

/** Structural contract for the learned OPQ rotation (s_opq_adc has no
  * SQL oracle — the driver-side eigensolve has no DuckDB replay — so
  * these assertions ARE its correctness gate, alongside the recall
  * curve in IvfRecallSpec):
  *  - R is orthonormal (RRᵀ = I) ⇒ rotation is an isometry, so ADC
  *    distances in the rotated space estimate the same geometry;
  *  - each eigenpair satisfies its eigen-equation against the
  *    distributed covariance (the Jacobi solve is RIGHT, not just
  *    orthogonal);
  *  - the eigenvalue allocation balances per-subspace log-variance
  *    products strictly better than the naive contiguous split;
  *  - the Spark-side rotate expression agrees with a driver-side
  *    matrix multiply (the literal-matrix transform is wired right).
  */
class OpqSpec extends SparkSpec {

  private def residuals() = graft.sim.Opq.residualFrame(spark, sfDir)

  test("learned rotation is orthonormal and satisfies the eigen-equation") {
    val res = residuals()
    val s = graft.sim.Opq.covariance(res)
    val (w, u) = graft.sim.Opq.jacobiEigen(s)
    val n = s.length
    // orthonormality of the eigenvector set
    var maxDev = 0.0
    for (a <- 0 until n; b <- a until n) {
      val dot = (0 until n).map(i => u(a)(i) * u(b)(i)).sum
      val expect = if (a == b) 1.0 else 0.0
      maxDev = math.max(maxDev, math.abs(dot - expect))
    }
    assert(maxDev < 1e-9, f"max |UUᵀ − I| = $maxDev%.2e")
    // eigen-equation residual ‖S·u − λ·u‖∞ per pair
    var maxEig = 0.0
    for (k <- 0 until n) {
      for (i <- 0 until n) {
        val su = (0 until n).map(j => s(i)(j) * u(k)(j)).sum
        maxEig = math.max(maxEig, math.abs(su - w(k) * u(k)(i)))
      }
    }
    assert(maxEig < 1e-8, f"max eigen-equation residual = $maxEig%.2e")
    // eigenvalues descending, all non-negative (covariance is PSD)
    assert(w.zip(w.tail).forall { case (a, b) => a >= b }, "eigenvalues not sorted desc")
    assert(w.last > -1e-12, s"negative eigenvalue ${w.last}")
    info(f"d=$n eigensolve: |UUᵀ−I|∞=$maxDev%.1e, ‖Su−λu‖∞=$maxEig%.1e, λ∈[${w.last}%.2e, ${w.head}%.2e]")
  }

  test("eigenvalue allocation balances subspace log-variance products beyond the contiguous split") {
    val res = residuals()
    val (w, _) = graft.sim.Opq.jacobiEigen(graft.sim.Opq.covariance(res))
    val m = graft.sim.Sim.PqM
    val cap = graft.sim.Sim.PqSubLen
    def spread(buckets: Seq[Seq[Int]]): Double = {
      val logs = buckets.map(_.map(i => StrictMath.log(math.max(w(i), 1e-300))).sum)
      logs.max - logs.min
    }
    val lpt = spread(graft.sim.Opq.allocate(w, m, cap))
    val naive = spread((0 until m).map(b => (b * cap until (b + 1) * cap).toSeq))
    info(f"log-product spread: LPT=$lpt%.3f vs contiguous=$naive%.3f")
    assert(lpt < naive, f"LPT spread $lpt%.3f not better than contiguous $naive%.3f")
    assert(lpt < 1.0, f"LPT spread $lpt%.3f not balanced")
    // every subspace exactly at capacity, covering all dims once
    val alloc = graft.sim.Opq.allocate(w, m, cap)
    assert(alloc.forall(_.size == cap) && alloc.flatten.sorted == w.indices.toList)
  }

  test("Spark-side rotate expression == driver-side matrix multiply; rotation is an isometry") {
    val res = residuals().limit(20).cache()
    val rot = graft.sim.Opq.learnRotation(residuals())
    val both = res
      .select(col("vec_id"), col("r"),
        graft.sim.Opq.rotateExpr(rot, col("r")).as("rr"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { row =>
      val x = row.getSeq[Double](1)
      val got = row.getSeq[Double](2)
      val want = rot.map(r => r.zip(x).map { case (a, b) => a * b }.sum)
      // rotate expr uses the native left-fold dot — same order as the
      // driver-side fold here, so this is exact, not approximate
      got.zip(want).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-12, s"vec ${row.getLong(0)}: $g vs $e")
      }
      val n0 = math.sqrt(x.map(a => a * a).sum)
      val n1 = math.sqrt(got.map(a => a * a).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"norm not preserved: $n0 vs $n1")
    }
    res.unpersist(blocking = false)
  }

  test("training artifacts match committed goldens (regression pin)") {
    // The training is deterministic by construction (cyclic Jacobi +
    // Lloyd in StrictMath, fixed sweeps, bounded sorted sample), so
    // exact Double bits are stable — this pin is the numeric
    // regression gate the missing SQL oracle can't provide. If an
    // INTENTIONAL training change moves these, re-pin from the
    // printed values.
    def mix(h: Long, v: Long): Long = (h ^ v) * 0x9e3779b97f4a7c15L
    def fp(doubles: Iterator[Double]): Long =
      doubles.foldLeft(0xcbf29ce484222325L)((h, d) =>
        mix(h, java.lang.Double.doubleToLongBits(d)))
    val art = graft.sim.Opq.opqArtifacts(spark, sfDir, 256)
    val rotFp = fp(art.rot.iterator.flatten)
    val bookFp = fp(art.books.iterator.flatMap(b =>
      b.sortBy(_._1).iterator.flatMap { case (code, c) => Iterator(code.toDouble) ++ c }))
    info(f"rotation fp = 0x$rotFp%016x, codebook fp = 0x$bookFp%016x")
    assert(art.rot.size === art.rot.head.size, "rotation not square")
    assert(rotFp === 0x5d698708dec2d4fbL, f"rotation fingerprint moved: 0x$rotFp%016x")
    assert(bookFp === 0x92658b60f2d02a8dL, f"codebook fingerprint moved: 0x$bookFp%016x")
  }

  test("s_opq_adc returns well-formed top-3 per probe") {
    val out = graft.sim.Opq.opqAdc.run(spark, sfDir).collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.size === 10)
    byProbe.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3))
    }
  }
}
