package graft

import org.apache.spark.sql.functions._

/** Contract for t_quality_probe's trained linear model: on a corpus
  * where the target class genuinely differs (long, lexically diverse
  * docs vs short repetitive ones) the fitted probe separates the
  * classes; training reduces the least-squares loss below the zero
  * model; and the fit is deterministic.
  */
class QualityProbeSpec extends SparkSpec {

  import spark.implicits._

  private def synth() = {
    // target: long, diverse; background: short, repetitive
    val target = (1L to 20L).map(i =>
      (i, (1 to 40).map(k => s"w$i$k").mkString(" ")))
    val bg = (100L to 139L).map(i =>
      (i, s"spam spam spam s$i spam spam"))
    (target ++ bg).toDF("doc_id", "text")
  }

  test("probe separates a genuinely different target class") {
    val feat = graft.text.Text.probeFeatures(synth(), isTarget = col("doc_id") <= 20).cache()
    val beta = graft.text.Text.trainProbe(feat)
    val scored = graft.text.Text.scoreProbe(feat, beta).collect()
    val (t, b) = scored.partition(_.getBoolean(2))
    val tMean = t.map(_.getDouble(1)).sum / t.length
    val bMean = b.map(_.getDouble(1)).sum / b.length
    info(f"target mean score $tMean%.4f vs background $bMean%.4f")
    assert(tMean > bMean + 0.05, f"probe failed to separate: $tMean%.4f vs $bMean%.4f")
    feat.unpersist(blocking = false)
  }

  test("training reduces least-squares loss vs the zero model; fit is deterministic") {
    val feat = graft.text.Text.probeFeatures(synth(), isTarget = col("doc_id") <= 20).cache()
    val beta = graft.text.Text.trainProbe(feat)
    val beta2 = graft.text.Text.trainProbe(feat)
    assert(beta.toSeq === beta2.toSeq, "training not deterministic")
    val rows = feat.collect()
    def loss(b: Array[Double]): Double = {
      val errs = rows.map { r =>
        val pred = (1 to 6).map(i => r.getAs[Double](s"f$i") * b(i - 1)).sum
        val e = pred - r.getAs[Double]("y")
        e * e
      }
      errs.sum / errs.length
    }
    val l0 = loss(Array.fill(6)(0.0))
    val lt = loss(beta)
    info(f"loss: zero model $l0%.4f -> trained $lt%.4f")
    assert(lt < l0 * 0.8, f"training did not reduce loss: $l0%.4f -> $lt%.4f")
    feat.unpersist(blocking = false)
  }

  test("registered query: top-K rows, contiguous ranks, scores non-increasing") {
    val rows = graft.text.Text.qualityProbe.run(spark, sfDir).collect()
    assert(rows.length === graft.text.Text.DsirTopK)
    assert(rows.map(_.getInt(0)).toSeq === (1 to graft.text.Text.DsirTopK))
    val ss = rows.map(_.getDouble(2)).toSeq
    assert(ss.zip(ss.tail).forall { case (x, y) => x >= y })
  }
}
