package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery

/** Diversity-based coreset selection over the embedding corpus
  * (SURVEY.md §2.E): the greedy k-center (farthest-point) rule of
  * Gonzalez 1985 — the standard geometric data-selection pass of an
  * LLM pipeline (pick the most mutually-distant exemplars; the dual of
  * dedup's "drop the closest pairs").
  *
  * Scale shape: the selected set is tiny (K rows) and rides along as
  * LITERALS, exactly like Lloyd's centroids — per round ONE map-side
  * distance pass over the cached corpus and ONE top-1 TakeOrdered
  * reduce (no sort shuffle, no corpus shuffle, driver traffic = one
  * row per round). Recomputing dmin from the full selected set each
  * round (array_min over K literal centers) rather than carrying a
  * per-row running dmin keeps every round a stateless scan of the one
  * cached frame — no lineage chain, no per-round persists; O(K²·n·dim)
  * total work, which for coreset-sized K is cheaper at 100 TB than
  * checkpointing K intermediate corpus frames.
  */
object Kcenter {

  /** Selected-coreset size: bounded so the oracle's generated
    * round-CTE chain stays replayable.
    */
  private[graft] val KcK = 12

  /** Greedy selection over a (vec_id, v) frame: seed = min vec_id,
    * then K−1 rounds of "farthest from the selected set" (exact d2,
    * ties → smaller vec_id). Returns (rank, vec_id, d2-at-selection);
    * the seed records 0. Every distance is the same left-fold
    * dotProduct as Sim.distStructs, so the oracle's LEAST-chained
    * replay is bit-identical.
    */
  private[graft] def greedySelect(e0: DataFrame, k: Int): Seq[(Int, Long, Double)] = {
    val e = e0.select(col("vec_id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed = e.orderBy("vec_id").head()
    var sel: Seq[(Long, Seq[Double])] = Vector((seed.getLong(0), seed.getSeq[Double](1)))
    var out = Vector((1, seed.getLong(0), 0.0))
    for (r <- 2 to k) {
      val far = e
        .select(col("vec_id"), col("v"),
          graft.gfunctions.argminCentroid(col("v"), sel).getField("d2").as("dmin"))
        .orderBy(col("dmin").desc, col("vec_id"))
        .head()
      sel = sel :+ (far.getLong(0), far.getSeq[Double](1))
      out = out :+ ((r, far.getLong(0), far.getDouble(2)))
    }
    e.unpersist(blocking = false)
    out
  }

  /** The oracle replay: round CTEs kc_s1..kc_s$k (selected rows) and
    * kc_d1..kc_d${k-1} (running dmin, LEAST-chained — the incremental
    * form of the engine's recomputed array_min: both are the exact min
    * of the same bit-identical d2 doubles).
    */
  private def kcenterSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n")
    sb.append("kc_s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),\n")
    // each kc_d CTE is referenced twice (next selection + next dmin):
    // MATERIALIZED stops the optimizer from inlining the chain, which
    // would otherwise expand 2^k copies of the distance expression
    sb.append(s"kc_d1 AS MATERIALIZED (SELECT e.vec_id, e.v, ${Sim.d2Sql("e.v", "kc_s1.v")} AS dmin\n" +
      "  FROM e CROSS JOIN kc_s1)")
    for (r <- 2 to k) {
      sb.append(s""",
        kc_s$r AS (SELECT vec_id, v, dmin FROM kc_d${r - 1}
                   ORDER BY dmin DESC, vec_id LIMIT 1)""")
      if (r < k)
        sb.append(s""",
          kc_d$r AS MATERIALIZED (SELECT d.vec_id, d.v,
                       LEAST(d.dmin, ${Sim.d2Sql("d.v", s"kc_s$r.v")}) AS dmin
                     FROM kc_d${r - 1} d CROSS JOIN kc_s$r)""")
    }
    val sels = (1 to k).map { r =>
      val d = if (r == 1) "0.0" else "ROUND(dmin, 4)"
      s"SELECT $r AS rank, vec_id, $d AS sel_d2 FROM kc_s$r"
    }.mkString("\nUNION ALL ")
    sb.append(s"\n$sels\nORDER BY rank")
    sb.toString
  }

  /** s_kcenter_coreset: the registered greedy k-center selection —
    * rank, selected vec_id, and squared distance to the previously-
    * selected set at selection time (the running coverage radius:
    * non-increasing, and sel_d2 of round r is the corpus coverage
    * radius of the first r−1 centers).
    */
  val kcenterCoreset = GraftQuery(
    "s_kcenter_coreset",
    Some(kcenterSql(KcK)),
    (s, d) => {
      import s.implicits._
      greedySelect(Sim.vecs(s, d), KcK)
        .map { case (r, id, d2) =>
          // HALF_UP on the exact binary double = Spark round = DuckDB ROUND
          (r, id, if (r == 1) 0.0
            else BigDecimal(d2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .toDF("rank", "vec_id", "sel_d2")
        .orderBy("rank")
    },
  )
}
