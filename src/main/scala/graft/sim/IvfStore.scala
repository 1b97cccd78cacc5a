package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sim.Sim.IvfIndex

/** Storage lifecycle for the ANN index artifacts — the
  * executor-loss-tolerant production shape that the in-session
  * localCheckpoint memos stand in for (see Caching.releaseAfter's
  * note): a cluster deploy builds the index ONCE, saves it to
  * storage, and every consumer loads it from there — surviving
  * executor loss, session restarts, and serving from a different job
  * than the build.
  *
  * Artifact layout under `dir`:
  *   - `assigned/`  — the IVF-assigned corpus (vec_id, v, cid, d2)
  *   - `centroids/` — the final centroids (cid, cv)
  *   - `codebooks/` — PQ subspace codebooks (sub, cid, cv)
  *   - `coded/`     — the IVF-ADC coded corpus (neighbor_id, cid, code0..3)
  *
  * Parquet round-trips doubles exactly, so a loaded index searches
  * bit-identically to the in-memory one (asserted in IvfStoreSpec).
  */
object IvfStore {

  def save(idx: IvfIndex, dir: String): Unit = {
    val s = idx.assigned.sparkSession
    import s.implicits._
    idx.assigned.write.mode("overwrite").parquet(s"$dir/assigned")
    idx.centroids.toDF("cid", "cv").write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def load(s: SparkSession, dir: String): IvfIndex = {
    val cents = s.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    IvfIndex(s.read.parquet(s"$dir/assigned"), cents)
  }

  def savePq(books: Seq[Seq[(Long, Seq[Double])]], coded: DataFrame,
             dir: String): Unit = {
    val s = coded.sparkSession
    import s.implicits._
    books.zipWithIndex
      .flatMap { case (b, j) => b.map { case (cid, cv) => (j, cid, cv) } }
      .toDF("sub", "cid", "cv").write.mode("overwrite").parquet(s"$dir/codebooks")
    coded.write.mode("overwrite").parquet(s"$dir/coded")
  }

  /** Online index ADD: assign a batch of new vectors (vec_id, v) to an
    * EXISTING index's centroids — the standard no-retrain append every
    * serving ANN index supports (retraining is a periodic offline
    * rebuild, not a per-batch cost). Assignment is the same map-side
    * argmin as the build, so adding batches one at a time is exactly
    * equivalent to assigning the union in one pass (asserted in
    * IvfStoreSpec).
    */
  def add(idx: IvfIndex, batch: DataFrame): IvfIndex =
    IvfIndex(
      idx.assigned.unionByName(Sim.assignTo(batch, idx.centroids)),
      idx.centroids)

  /** Periodic write-back for a serving index that has accumulated
    * online `add` batches: every add wraps another unionByName, so
    * after N batches the assigned plan is an N-deep union chain that
    * every search re-walks (and that grows without bound in a
    * long-lived serving job). compact() persists the unioned
    * assignment via save() and returns the reloaded index — plan
    * depth drops back to a single parquet scan however many adds
    * came before, and search results are unchanged (parquet
    * round-trips doubles bit-exactly; asserted in IvfStoreSpec).
    */
  def compact(idx: IvfIndex, dir: String): IvfIndex = {
    save(idx, dir)
    load(idx.assigned.sparkSession, dir)
  }

  def loadPq(s: SparkSession, dir: String): (Seq[Seq[(Long, Seq[Double])]], DataFrame) = {
    val rows = s.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.map(r => (r._2, r._3)).toSeq.sortBy(_._1) }
    (books, s.read.parquet(s"$dir/coded"))
  }
}
