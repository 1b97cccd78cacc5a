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
  *   - `meta/`      — one row of retrain-trigger baselines (see [[IvfMeta]])
  *   - `codebooks/` — PQ subspace codebooks (sub, cid, cv)
  *   - `coded/`     — the IVF-ADC coded corpus (neighbor_id, cid, code0..3)
  *
  * Parquet round-trips doubles exactly, so a loaded index searches
  * bit-identically to the in-memory one (asserted in IvfStoreSpec).
  */
object IvfStore {

  /** The retrain-trigger baselines, recorded by [[save]] at publish
    * time and read back by [[loadMeta]] — so a serving job applies the
    * trigger rule to arriving batches with NO corpus-sized recompute:
    *   - `d2Base`    — mean squared assign distance of the trained
    *     corpus under its own centroids (the [[batchD2Ratio]] denominator)
    *   - `imbalance` — the assigned cells' max/avg population at save
    *     time (the rule's "doubles from build" reference point)
    *   - `k`, `n`    — centroid count and corpus size at save time
    */
  final case class IvfMeta(d2Base: Double, imbalance: Double, k: Int, n: Long)

  /** The trigger baselines of an in-memory index — one agg pass over
    * `assigned` (k-row intermediate). save() runs this over the
    * just-written parquet so the stats are of the artifact, not of a
    * possibly-lazy plan.
    */
  def computeMeta(assigned: DataFrame, k: Int): IvfMeta = {
    import org.apache.spark.sql.functions._
    // decimal-exact d2 sum: d2Base feeds the oracle-replayed
    // st_index_health ratio, so its double must not depend on
    // partition/summation order (the lloyd centroid-mean convention)
    val dec = org.apache.spark.sql.types.DecimalType(28, 10)
    val r = assigned.groupBy("cid")
      .agg(count(lit(1)).as("cnt"), sum(col("d2").cast(dec)).as("sd2"))
      .agg(sum("cnt").cast("long").as("n"),
        sum("sd2").cast("double").as("sd2"),
        (max("cnt").cast("double") / (sum("cnt").cast("double") / count(lit(1))))
          .as("imb"))
      .head()
    IvfMeta(r.getDouble(1) / r.getLong(0), r.getDouble(2), k, r.getLong(0))
  }

  /** Persist the index artifacts. The assigned corpus is STAGED
    * (written to `assigned_tmp`, then swapped in) rather than written
    * over `dir/assigned` directly: the natural serving lifecycle hands
    * this method an index whose `assigned` is a LAZY plan over that
    * very directory (load→add→compact, load→compactRetrain), and a
    * direct `mode("overwrite")` would delete its own input mid-scan —
    * job failure at best, a wiped serving index at worst. With the
    * stage+swap, the write job completes against the old files before
    * the old files go away. Frames loaded from `dir` BEFORE a save are
    * invalidated by the swap (their file listing is stale); consumers
    * use the returned/re-loaded index, as compact/compactRetrain do.
    *
    * Crash-consistency boundary: the swap protects the EXPENSIVE
    * artifact (the corpus-sized assignment) but assigned/centroids/
    * meta are still three writes — a crash between them leaves a
    * mixed-version dir. A deploy that needs artifact-level atomicity
    * publishes each rebuild to a fresh `dir/v{n}` and swaps a pointer
    * (manifest) instead; the meta computation below reads only
    * (cid, d2) — a column-pruned fraction of the index bytes.
    */
  def save(idx: IvfIndex, dir: String): Unit = {
    val s = idx.assigned.sparkSession
    import s.implicits._
    val tmp = s"$dir/assigned_tmp"
    idx.assigned.write.mode("overwrite").parquet(tmp)
    val hconf = s.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/assigned")
    val fs = live.getFileSystem(hconf)
    fs.delete(live, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live))
      sys.error(s"IvfStore.save: rename $tmp -> $live failed")
    idx.centroids.toDF("cid", "cv").write.mode("overwrite").parquet(s"$dir/centroids")
    val m = computeMeta(s.read.parquet(s"$dir/assigned"), idx.centroids.size)
    Seq((m.d2Base, m.imbalance, m.k, m.n))
      .toDF("d2_base", "imbalance", "k", "n")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(s: SparkSession, dir: String): IvfIndex = {
    val cents = s.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    IvfIndex(s.read.parquet(s"$dir/assigned"), cents)
  }

  /** The trigger baselines of a published index — a 1-row parquet
    * read, NOT a corpus agg: this is what makes the trigger rule
    * applicable per arriving batch in a serving job that only ever
    * `load`ed the index.
    */
  def loadMeta(s: SparkSession, dir: String): IvfMeta = {
    val r = s.read.parquet(s"$dir/meta").head()
    IvfMeta(r.getDouble(0), r.getDouble(1), r.getInt(2), r.getLong(3))
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

  /** Retrain trigger statistic, computable at add time with one
    * map-side argmin pass over the batch: the batch's mean squared
    * assign distance under the FROZEN centroids over the trained
    * corpus' own mean (`d2Base` — persisted by [[save]] in `meta/`
    * and read back via [[loadMeta]], so a serving job applies the
    * rule with no corpus-sized recompute). A quantizer that still
    * represents the incoming data reads ~1.0; appends drawn from
    * clusters the training never saw read well above it. Measured
    * (AddProbe, ADDPROBE_*_r12): stationary appends read 0.999 at
    * every level from 2x to 10x the trained corpus, drifted appends
    * read 1.187 (200k base) / 2.065 (2M base). Trigger rule: schedule
    * [[compactRetrain]] when a batch exceeds ~1.1 (the stationary
    * band is ±0.001, so the margin is wide) or the assigned cell
    * max/avg imbalance doubles from build time; the measured stale
    * recall floor was >= 0.90 at every scale, so retraining is
    * scheduled maintenance, not an emergency path.
    */
  def batchD2Ratio(idx: IvfIndex, batch: DataFrame, d2Base: Double): Double = {
    import org.apache.spark.sql.functions.avg
    Sim.assignTo(batch, idx.centroids).agg(avg("d2")).head().getDouble(0) / d2Base
  }

  /** The documented trigger rule as CODE (it lived only in the
    * Scaladoc until r13): schedule [[compactRetrain]] when a batch's
    * d2 ratio exceeds 1.1 (the measured stationary band is 0.999 ±
    * 0.001, so the margin is wide) or the observed cell max/avg
    * imbalance doubles from the save-time baseline. Consumed per
    * micro-batch by the st_index_health serving view
    * (streaming/Streaming.scala) via the shared
    * [[Sim.indexHealth]] frame.
    */
  val D2RatioTrigger = 1.1
  val ImbalanceDoubling = 2.0

  def retrainDue(d2Ratio: Double, imbalance: Double, meta: IvfMeta): Boolean =
    d2Ratio >= D2RatioTrigger || imbalance >= ImbalanceDoubling * meta.imbalance

  /** Offline rebuild at the CURRENT size — the operation the trigger
    * rule fires after enough [[add]] batches: k rides
    * Sim.semDedupCells(n), Lloyd trains on a hash-stride sample of
    * the WHOLE current corpus (base + appends — a vec_id-prefix
    * sample would train on base rows only and rebuild the stale
    * quantizer under a new name), then one full map-side
    * reassignment. The sample is re-keyed densely before Lloyd:
    * Lloyd seeds from `vec_id < k`, and a strided sample retains only
    * ~k/stride of those ids — without the re-key the rebuild would
    * silently start from a near-empty seed set.
    */
  def retrain(corpus: DataFrame, iters: Int = 3): IvfIndex = {
    import org.apache.spark.sql.functions._
    val n = corpus.count()
    val k = Sim.semDedupCells(n)
    Sim.guardOracleCells(k, n)
    val trainN = math.max(5000L, 50L * k)
    val stride = math.max(1L, n / trainN)
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    // ~trainN rows through a single-partition window — bounded by the
    // training-sample cap, not the corpus
    val sample = corpus
      .filter(pmod(xxhash64(col("vec_id"), lit("trainsample")), lit(stride)) === 0)
      .select((row_number().over(w) - 1).cast("long").as("vec_id"), col("v"))
    val cents = Sim.lloyd(sample, col("v"), k, iters)
    IvfIndex(Sim.assignTo(corpus.select(col("vec_id"), col("v")), cents), cents)
  }

  /** The full staleness-recovery cycle for a long-lived serving
    * index: rebuild the quantizer at the current corpus size and
    * persist the result, returning the reloaded (single-scan,
    * freshly-trained) index. `dir` may be — and in the documented
    * serving pattern IS — the directory backing `idx` itself: the
    * retrained assignment plan lazily reads `dir/assigned`, and
    * save()'s stage+swap is what makes overwriting it safe
    * (spec-gated: the save→load→add→compactRetrain(SAME dir)→search
    * round trip in IvfStoreSpec).
    */
  def compactRetrain(idx: IvfIndex, dir: String): IvfIndex = {
    val fresh = retrain(idx.assigned)
    save(fresh, dir)
    load(idx.assigned.sparkSession, dir)
  }

  /** Periodic write-back for a serving index that has accumulated
    * online `add` batches: every add wraps another unionByName, so
    * after N batches the assigned plan is an N-deep union chain that
    * every search re-walks (and that grows without bound in a
    * long-lived serving job). compact() persists the unioned
    * assignment via save() and returns the reloaded index — plan
    * depth drops back to a single parquet scan however many adds
    * came before, and search results are unchanged (parquet
    * round-trips doubles bit-exactly; asserted in IvfStoreSpec).
    * Like compactRetrain, `dir` may be the index's own backing dir —
    * the add-chain plan reads `dir/assigned` and save()'s stage+swap
    * keeps the write from consuming its own input.
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
